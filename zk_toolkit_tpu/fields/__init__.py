from zk_toolkit_tpu.fields.prime_field import PrimeField, PrimeFieldElem, PrimeFieldElems
