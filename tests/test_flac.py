"""Native FLAC decoder (native/nsp_flac.cc) round-trip tests.

No FLAC encoder exists in this image, so the tests carry a minimal
spec-conformant encoder (verbatim subframes, and fixed-order-1 prediction
with Rice-coded residuals) to produce real streams; the decoded samples
must be bit-identical to the source."""
import numpy as np
import pytest

from neural_sp_tpu.utils.native import get_lib, read_flac
from neural_sp_tpu.utils.io import read_audio

pytestmark = pytest.mark.skipif(
    get_lib() is None or not hasattr(get_lib(), "nsp_flac_decode"),
    reason="native library unavailable")


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((int(v) >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | (self.bits[i + j] if i + j < len(self.bits)
                                else 0)
            out.append(b)
        return bytes(out)


def _streaminfo(sample_rate, n, bps=16, channels=1):
    bw = BitWriter()
    bw.write(16, 16)      # min blocksize
    bw.write(65535, 16)   # max blocksize
    bw.write(0, 24)       # min frame size (unknown)
    bw.write(0, 24)       # max frame size
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    body = bw.bytes() + b"\x00" * 16  # md5 zeros
    hdr = bytes([0x80]) + len(body).to_bytes(3, "big")  # last block, type 0
    return hdr + body


def _frame_header(blocksize, frame_no):
    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)        # reserved
    bw.write(0, 1)        # fixed blocksize strategy
    bw.write(7, 4)        # blocksize: 16-bit at end
    bw.write(0, 4)        # sample rate: from streaminfo
    bw.write(0, 4)        # 1 channel, independent
    bw.write(4, 3)        # 16 bps
    bw.write(0, 1)        # reserved
    assert frame_no < 0x80
    bw.write(frame_no, 8)     # utf8 number (1 byte)
    bw.write(blocksize - 1, 16)
    bw.write(0, 8)        # CRC-8 (decoder skips)
    return bw


def encode_flac_verbatim(x, sample_rate, blocksize=256):
    """x: int16 mono."""
    out = b"fLaC" + _streaminfo(sample_rate, len(x))
    for fno, start in enumerate(range(0, len(x), blocksize)):
        blk = x[start: start + blocksize]
        bw = _frame_header(len(blk), fno)
        bw.write(0, 1)    # subframe padding bit
        bw.write(1, 6)    # VERBATIM
        bw.write(0, 1)    # no wasted bits
        for s in blk:
            bw.write(int(s) & 0xFFFF, 16)
        bw.align()
        bw.write(0, 16)   # frame CRC-16 (decoder skips)
        out += bw.bytes()
    return out


def _rice_write(bw, v, param):
    u = (v << 1) ^ (v >> 63) if False else (v * 2 if v >= 0 else -v * 2 - 1)
    q, r = u >> param, u & ((1 << param) - 1)
    for _ in range(q):
        bw.write(0, 1)
    bw.write(1, 1)
    bw.write(r, param)


def encode_flac_fixed1(x, sample_rate, blocksize=256, param=6):
    """FIXED order-1 subframes with single-partition Rice residuals."""
    out = b"fLaC" + _streaminfo(sample_rate, len(x))
    for fno, start in enumerate(range(0, len(x), blocksize)):
        blk = [int(s) for s in x[start: start + blocksize]]
        bw = _frame_header(len(blk), fno)
        bw.write(0, 1)
        bw.write(8 + 1, 6)   # FIXED order 1
        bw.write(0, 1)
        bw.write(blk[0] & 0xFFFF, 16)   # warmup
        bw.write(0, 2)       # rice method 0 (4-bit params)
        bw.write(0, 4)       # partition order 0
        bw.write(param, 4)
        for i in range(1, len(blk)):
            _rice_write(bw, blk[i] - blk[i - 1], param)
        bw.align()
        bw.write(0, 16)
        out += bw.bytes()
    return out


@pytest.mark.parametrize("encoder", [encode_flac_verbatim,
                                     encode_flac_fixed1])
def test_flac_roundtrip(tmp_path, encoder):
    rng = np.random.default_rng(0)
    # smooth-ish signal keeps order-1 residuals small (valid rice sizes)
    x = (np.cumsum(rng.integers(-80, 80, 5000))
         .clip(-30000, 30000)).astype(np.int16)
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(encoder(x, 16000))
    y, sr = read_flac(path)
    assert sr == 16000
    np.testing.assert_array_equal(
        (y * 32768.0).round().astype(np.int16), x)


def test_read_audio_dispatch(tmp_path):
    rng = np.random.default_rng(1)
    x = (np.cumsum(rng.integers(-50, 50, 2000))
         .clip(-20000, 20000)).astype(np.int16)
    path = str(tmp_path / "u.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_verbatim(x, 16000))
    y, sr = read_audio(path)
    assert sr == 16000 and len(y) == len(x)
    assert abs(float(y[5]) * 32768.0 - float(x[5])) < 1.0


def test_flac_info(tmp_path):
    import ctypes
    x = np.zeros(1234, np.int16)
    path = str(tmp_path / "i.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_verbatim(x, 8000))
    lib = get_lib()
    total = ctypes.c_int64()
    rate = ctypes.c_int32()
    ch = ctypes.c_int32()
    assert lib.nsp_flac_info(path.encode(), ctypes.byref(total),
                             ctypes.byref(rate), ctypes.byref(ch)) == 0
    assert (total.value, rate.value, ch.value) == (1234, 8000, 1)
