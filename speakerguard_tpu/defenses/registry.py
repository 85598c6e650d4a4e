"""Defense name -> function resolution and CLI-style param parsing.

Re-design of reference defense/defense.py: same registry of ~18 input
transformations across four groups, the same (defense, defense_param,
defense_flag, defense_order) triple parsing, and the same canonical
defense-name string used in artifact paths.
"""

import functools

from speakerguard_tpu.defenses import time_domain as TD
from speakerguard_tpu.defenses import frequency_domain as FD
from speakerguard_tpu.defenses import speech_compression as SC
from speakerguard_tpu.defenses import feature_level as FL

INPUT_TRANSFORMATIONS = [
    "QT", "BDR", "AT", "AS", "MS",                            # time domain
    "DS", "LPF", "BPF",                                       # freq domain
    "OPUS", "SPEEX", "AMR", "AAC_V", "AAC_C", "MP3_V", "MP3_C",  # codecs
    "MULAW", "ADPCM",   # ffmpeg-free on-device codecs (extension)
    "FEATURE_COMPRESSION", "FeCo",                            # feature level
]

ROBUST_TRAINING = ["AdvT"]  # adversarial training (cli/adver_train.py)

_SOURCES = (TD, FD, SC, FL)


def lambda_defense(defense: str, defense_param):
    """Returns f(x, rng=None) (reference defense/defense.py:53-85)."""
    if defense is None:
        return lambda x, rng=None: x
    src = next((m for m in _SOURCES if hasattr(m, defense)), None)
    if src is None:
        raise NotImplementedError(f"Unsupported defense {defense}")
    f = getattr(src, defense)

    if defense in ("FeCo", "FEATURE_COMPRESSION"):
        cl_m, cl_r, other = (defense_param[0], float(defense_param[1]),
                             defense_param[2])
        return functools.partial(f, method=cl_m, param=cl_r,
                                 other_param=other)
    if defense_param is None:
        return f
    if defense == "BPF":
        param = (float(defense_param[0]), float(defense_param[1]))
    elif defense in ("DS",):
        param = float(defense_param[0])
    elif defense in ("AT", "LPF"):
        param = float(defense_param[0])
    else:
        param = int(defense_param[0])
    return functools.partial(f, param=param)


def parser_defense(defense, defense_param, defense_flag, defense_order):
    """defense: list[str]; defense_param: list[str|None] (space-separated
    values); defense_flag: list[int]; defense_order: 'sequential'|'average'.

    Returns ([(flag, fn)], canonical_name) with the reference's exact
    name-mangling (defense/defense.py:20-50)."""
    if defense is None:
        return None, None
    if defense_param is None:
        defense_param = [None] * len(defense)
    assert len(defense) == len(defense_param) == len(defense_flag)
    sep = "+" if defense_order == "sequential" else "$"
    my_defense, name = [], ""
    for x, y, z in zip(defense, defense_param, defense_flag):
        f = lambda_defense(x, y.split(" ") if y is not None else None)
        my_defense.append([z, f])
        tag = y.replace(" ", "#") if y is not None else "DEFAULT"
        name += f"{x}&{tag}@{z}{sep}"
    return my_defense, name[:-1].replace(".", "_")
