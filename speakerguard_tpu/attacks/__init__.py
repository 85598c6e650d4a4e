from speakerguard_tpu.attacks.gradient import FGSM, PGD, CWinf  # noqa: F401
from speakerguard_tpu.attacks.cw2 import CW2  # noqa: F401
from speakerguard_tpu.attacks.fakebob import FAKEBOB  # noqa: F401
from speakerguard_tpu.attacks.siren import SirenAttack  # noqa: F401
from speakerguard_tpu.attacks.kenan import Kenan  # noqa: F401
