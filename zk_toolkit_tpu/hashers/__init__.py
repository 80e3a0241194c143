from zk_toolkit_tpu.hashers.sha256 import Sha256
from zk_toolkit_tpu.hashers.sha512 import Sha512
from zk_toolkit_tpu.hashers.hmac import Hmac, HmacSha256, HmacSha512
