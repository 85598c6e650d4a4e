"""Speech-compression defenses: lossy codec round-trips (7 codecs).

Re-design of reference defense/speech_compression.py: the codec math is
inherently host-side (ffmpeg subprocesses, native dep N2), so the round-trip
runs under ``jax.pure_callback`` with static shapes, and the whole defense
is BPDA-wrapped with an identity backward (straight-through), matching the
reference's BPDA(Speech_Compression_Non_Diff, identity).

Decoded-length realignment (codecs may pad/shift) follows the reference:
known per-codec start offsets where stable, otherwise a min-L1-distance
search (:48-60).

If ffmpeg is unavailable the defense raises at call time with instructions —
identical failure mode to the reference, which also requires an ffmpeg
install (instructions_ffmpeg.md).
"""

import os
import shlex
import shutil
import subprocess
import tempfile
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.adaptive.bpda import bpda
from speakerguard_tpu.utils.ranges import ABS_MAX


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _write_wav(path, fs, audio_int16):
    from scipy.io.wavfile import write
    write(path, fs, audio_int16)


def _read_wav(path):
    from scipy.io.wavfile import read
    _, data = read(path)
    return data


def _roundtrip_one(audio: np.ndarray, name: str, param, fs: int,
                   start_hint, tmp_dir: str, idx: int) -> np.ndarray:
    """audio: int16 (L,) -> decoded int16 (<= padded back to L)."""
    src = os.path.join(tmp_dir, f"{idx}.wav")
    _write_wav(src, fs, audio)
    coded = os.path.join(tmp_dir, f"{idx}.{name}")
    cmd1 = f"ffmpeg -y -i {src} -ac 1 -ar {fs} {param[0]} {param[1]} -c:a {param[2]} {coded}"
    dec = os.path.join(tmp_dir, f"{idx}-dec.wav")
    cmd2 = f"ffmpeg -y -i {coded} -ac 1 -ar {fs} -c:a pcm_s16le {dec}"
    for cmd in (cmd1, cmd2):
        subprocess.run(shlex.split(cmd), check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    out = _read_wav(dec)
    n = len(audio)
    if out.size <= n:
        return np.pad(out, (0, n - out.size)).astype(np.int16)
    start = start_hint
    if start is None:
        a = audio.astype(np.float64) / ABS_MAX
        o = out.astype(np.float64) / ABS_MAX
        dists = [np.abs(a - o[s:s + n]).sum()
                 for s in range(0, out.size - n + 1)]
        start = int(np.argmin(dists))
    return out[start:start + n].astype(np.int16)


def _compression_host(new: np.ndarray, name: str, param, fs: int,
                      start_hint, n_jobs: int = 10) -> np.ndarray:
    """new: float (B, L) in either domain -> same shape/domain."""
    if not ffmpeg_available():
        raise RuntimeError(
            "speech-compression defenses require ffmpeg with codec support "
            "(libopus/libspeex/amr/fdk-aac/mp3); see the reference's "
            "instructions_ffmpeg.md")
    x = np.asarray(new)
    scale = bool(x.min() >= -2.0 and x.max() <= 2.0)
    if scale:
        x = x * ABS_MAX
    x = np.clip(x, -ABS_MAX, ABS_MAX - 1).astype(np.int16)
    b = x.shape[0]
    out = np.empty_like(x)
    tmp_dir = tempfile.mkdtemp(prefix=f"{name}-coding-")
    try:
        def work(i):
            out[i] = _roundtrip_one(x[i], name, param, fs, start_hint,
                                    tmp_dir, i)
        if b == 1 or n_jobs <= 1:
            for i in range(b):
                work(i)
        else:
            with ThreadPoolExecutor(max_workers=min(n_jobs, b)) as ex:
                list(ex.map(work, range(b)))
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    res = out.astype(np.float32)
    if scale:
        res = res / ABS_MAX
    return res


def _make_codec(name: str, args3, start_hint):
    import functools

    @functools.lru_cache(maxsize=None)
    def ste_for(param, fs, n_jobs):
        def non_diff(audio):
            shape = audio.shape
            x = audio.reshape(shape[0], -1) if audio.ndim == 3 else (
                audio[None, :] if audio.ndim == 1 else audio)
            fn = lambda arr: _compression_host(  # noqa: E731
                arr, name, [args3[0], str(param), args3[1]], fs, start_hint,
                n_jobs)
            y = jax.pure_callback(fn,
                                  jax.ShapeDtypeStruct(x.shape, jnp.float32),
                                  x, vmap_method="sequential")
            return y.reshape(shape)
        return bpda(non_diff)

    def codec(audio, param, fs=16000, rng=None, n_jobs=10):
        return ste_for(param, fs, n_jobs)(audio)

    return codec


OPUS = _make_codec("opus", ("-b:a", "libopus"), 69)
SPEEX = _make_codec("spx", ("-b:a", "libspeex"), None)
AAC_V = _make_codec("aac", ("-vbr", "libfdk_aac"), 2048)
AAC_C = _make_codec("aac", ("-b:a", "libfdk_aac"), 2048)
MP3_V = _make_codec("mp3", ("-q:a", "mp3"), 0)
MP3_C = _make_codec("mp3", ("-b:a", "mp3"), 0)

_AMR_WB = _make_codec("amr", ("-b:a", "libvo_amrwbenc"), None)
_AMR_NB = _make_codec("amr", ("-b:a", "libopencore_amrnb"), None)

_AMR_LEGAL = {16000: [6600, 8850, 12650, 14250, 15850, 18250, 19850, 23050,
                      23850],
              8000: [4750, 5150, 5900, 6700, 7400, 7950, 10200, 12200]}


def AMR(audio, param=6600, fs=16000, rng=None, n_jobs=10):
    if fs not in _AMR_LEGAL:
        raise NotImplementedError("AMR supports fs in {16000, 8000}")
    if int(param) not in _AMR_LEGAL[fs]:
        raise NotImplementedError(f"{param} not allowed for fs={fs}")
    codec = _AMR_WB if fs == 16000 else _AMR_NB
    return codec(audio, param, fs, rng=rng, n_jobs=n_jobs)


# defaults per reference speech_compression.py:139-201
DEFAULT_PARAMS = {"OPUS": 16000, "SPEEX": 43200, "AMR": 6600, "AAC_V": 5,
                  "AAC_C": 20000, "MP3_V": 9, "MP3_C": 16000,
                  "MULAW": 255, "ADPCM": 4}


# ---------------------------------------------------------------------------
# ffmpeg-free compression codecs, on-device (extensions beyond the reference)
# ---------------------------------------------------------------------------
# The 7 reference codecs need an ffmpeg build with non-free encoders; these
# two classic speech codecs run entirely on the TPU so a compression defense
# is always available: µ-law companding (G.711) is elementwise, IMA ADPCM
# (DVI4) is a lax.scan over time.  Quantization is non-differentiable, so
# both are BPDA-wrapped (straight-through), like the ffmpeg codecs.

def _to_scale(audio):
    """Branch-free domain detection, same heuristic as _compression_host."""
    big = jnp.logical_or(jnp.max(audio) > 2.0, jnp.min(audio) < -2.0)
    factor = jnp.where(big, 1.0 / ABS_MAX, 1.0)
    return audio * factor, jnp.where(big, ABS_MAX, 1.0)


def _mulaw_nondiff(audio, mu):
    x, restore = _to_scale(audio)
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    # quantize the companded signal to (mu+1) levels (8-bit for mu=255)
    q = jnp.round((y + 1.0) * 0.5 * mu) / mu * 2.0 - 1.0
    dec = jnp.sign(q) * (jnp.power(1.0 + mu, jnp.abs(q)) - 1.0) / mu
    return dec * restore


# IMA ADPCM step-size table (DVI ADPCM specification)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.float32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.float32)


def _adpcm_nondiff(audio, bits):
    """IMA ADPCM encode+decode round-trip over the time axis via lax.scan.
    audio: (B, L); bits=4 is the standard nibble coder."""
    x, restore = _to_scale(audio)
    x16 = jnp.clip(x * ABS_MAX, -ABS_MAX, ABS_MAX - 1.0)  # int16 domain
    steps = jnp.asarray(_IMA_STEPS)
    adj = jnp.asarray(_IMA_INDEX_ADJ)
    mag_max = float(2 ** (bits - 1) - 1)  # 7 for 4-bit

    def body(carry, sample):
        pred, idx = carry                          # (B,), (B,)
        step = steps[idx.astype(jnp.int32)]
        diff = sample - pred
        sign = diff < 0
        mag = jnp.abs(diff)
        # bit-serial magnitude coder; recon accumulates the decoder's vpdiff
        # (canonical IMA: vpdiff = step>>3 + sum of taken step/2^k taps)
        code = jnp.zeros_like(mag)
        recon = jnp.zeros_like(mag)
        rem = mag
        s = step
        for _ in range(bits - 1):
            bit = rem >= s
            code = code * 2 + bit
            rem = jnp.where(bit, rem - s, rem)
            recon = recon + bit * s
            s = s / 2.0
        code = jnp.minimum(code, mag_max)
        recon = recon + s
        recon = jnp.where(sign, -recon, recon)
        pred = jnp.clip(pred + recon, -ABS_MAX, ABS_MAX - 1.0)
        idx = jnp.clip(idx + adj[jnp.minimum(code, 7.0).astype(jnp.int32)],
                       0, len(_IMA_STEPS) - 1)
        return (pred, idx), pred

    b = x16.shape[0]
    init = (jnp.zeros((b,), x16.dtype), jnp.zeros((b,), jnp.float32))
    _, decoded = jax.lax.scan(body, init, jnp.moveaxis(x16, -1, 0))
    return jnp.moveaxis(decoded, 0, -1) / ABS_MAX * restore


def MULAW(audio, param=255, fs=16000, rng=None, n_jobs=None):
    """µ-law (G.711) compand -> quantize -> expand, fully on device."""
    return bpda(lambda a: _mulaw_nondiff(a, float(param)))(audio)


def ADPCM(audio, param=4, fs=16000, rng=None, n_jobs=None):
    """IMA ADPCM round-trip (param = bits per sample), fully on device."""
    return bpda(lambda a: _adpcm_nondiff(a, int(param)))(audio)
