"""curve25519 Edwards point tests (base point, group law, recover_x)."""

from zk_toolkit_tpu.curves import curve25519 as c

# RFC 8032 base point coordinates
BX = 15112221349535400772501151409588531511454012693041857206046113283949847762202
BY = 46316835694926478169428394003475163141307993866256225615783033603165251855960


def test_base_point_matches_rfc8032():
    b = c.B()
    assert b.x.e == BX
    assert b.y.e == BY
    assert b.is_on_curve()


def test_group_law():
    b = c.B()
    o = c.EdwardsPoint.infinity()
    assert b + o == b
    # subgroup order lands on the rational neutral (0, 1) — the Edwards
    # addition law never produces the synthetic AtInfinity (reference parity:
    # the Rust add always returns Rational for Rational inputs)
    neutral = b * c.L
    assert neutral.x.e == 0 and neutral.y.e == 1
    assert b * (c.L + 1) == b
    assert b * 2 == b + b
    assert (b + b) + b == b + (b + b)
    assert ((b * 5) + (-(b * 2))) == b * 3
    assert (b * 3).is_on_curve()


def test_recover_x_parities():
    b = c.B()
    x_even = c.recover_x(c.d(), b.y, c.Parity.EVEN)
    x_odd = c.recover_x(c.d(), b.y, c.Parity.ODD)
    assert x_even.e == BX
    assert x_odd == -x_even
    assert x_even.e % 2 == 0 and x_odd.e % 2 == 1
