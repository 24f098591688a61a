"""ctypes harness for libmp3lame (encode oracle) + libmpg123 (decode oracle)."""
import ctypes as C
import numpy as np

_lame = C.CDLL("libmp3lame.so.0")
_mpg = C.CDLL("libmpg123.so.0")

_lame.lame_init.restype = C.c_void_p
for _f in ("lame_set_in_samplerate", "lame_set_num_channels", "lame_set_mode",
           "lame_set_brate", "lame_set_out_samplerate", "lame_set_bWriteVbrTag",
           "lame_set_disable_reservoir", "lame_set_no_short_blocks"):
    getattr(_lame, _f).argtypes = [C.c_void_p, C.c_int]
_lame.lame_init_params.argtypes = [C.c_void_p]
_lame.lame_encode_buffer.argtypes = [C.c_void_p, C.POINTER(C.c_short),
                                     C.POINTER(C.c_short), C.c_int,
                                     C.POINTER(C.c_ubyte), C.c_int]
_lame.lame_encode_flush.argtypes = [C.c_void_p, C.POINTER(C.c_ubyte), C.c_int]
_lame.lame_close.argtypes = [C.c_void_p]
_mpg.mpg123_new.argtypes = [C.c_char_p, C.POINTER(C.c_int)]
_mpg.mpg123_param.argtypes = [C.c_void_p, C.c_int, C.c_long, C.c_double]
_mpg.mpg123_format_none.argtypes = [C.c_void_p]
_mpg.mpg123_format.argtypes = [C.c_void_p, C.c_long, C.c_int, C.c_int]
_mpg.mpg123_open_feed.argtypes = [C.c_void_p]
_mpg.mpg123_feed.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t]
_mpg.mpg123_read.argtypes = [C.c_void_p, C.POINTER(C.c_ubyte), C.c_size_t,
                             C.POINTER(C.c_size_t)]
_mpg.mpg123_getformat.argtypes = [C.c_void_p, C.POINTER(C.c_long),
                                  C.POINTER(C.c_int), C.POINTER(C.c_int)]
_mpg.mpg123_delete.argtypes = [C.c_void_p]

def lame_encode(pcm, sr=16000, kbps=32, mono=True):
    gf = _lame.lame_init()
    _lame.lame_set_in_samplerate(gf, sr)
    _lame.lame_set_num_channels(gf, 1)
    _lame.lame_set_mode(gf, 3)  # mono
    _lame.lame_set_brate(gf, kbps)
    _lame.lame_set_out_samplerate(gf, sr)
    _lame.lame_set_bWriteVbrTag(gf, 0)
    _lame.lame_set_disable_reservoir(gf, 0)
    assert _lame.lame_init_params(gf) >= 0
    x = np.clip(np.asarray(pcm, np.float64), -1, 1)
    s16 = (x * 32767).astype(np.int16)
    nbuf = len(s16) * 5 // 4 + 7200
    buf = (C.c_ubyte * nbuf)()
    n = _lame.lame_encode_buffer(
        gf, s16.ctypes.data_as(C.POINTER(C.c_short)), None, len(s16), buf, nbuf)
    assert n >= 0, n
    out = bytes(buf[:n])
    n2 = _lame.lame_encode_flush(gf, buf, nbuf)
    out += bytes(buf[:n2])
    _lame.lame_close(gf)
    return out

_mpg.mpg123_init()
_mpg.mpg123_new.restype = C.c_void_p
_mpg.mpg123_strerror.restype = C.c_char_p
_mpg.mpg123_plain_strerror.restype = C.c_char_p

MPG123_ENC_FLOAT_32 = 0x200
def mpg123_decode(data: bytes, force_float=True, verbose=False):
    """Feed an mp3 byte stream; return (float32 pcm, sample_rate, channels, errs)."""
    err = C.c_int(0)
    h = _mpg.mpg123_new(None, C.byref(err))
    assert h
    # quiet + no resampling surprises
    _mpg.mpg123_param(C.c_void_p(h), 4, 0x20, C.c_double(0))  # ADD_FLAGS QUIET
    if force_float:
        _mpg.mpg123_format_none(C.c_void_p(h))
        for rate in (8000,11025,12000,16000,22050,24000,32000,44100,48000):
            _mpg.mpg123_format(C.c_void_p(h), C.c_long(rate), 3, MPG123_ENC_FLOAT_32)
    assert _mpg.mpg123_open_feed(C.c_void_p(h)) == 0
    _mpg.mpg123_feed(C.c_void_p(h), data, len(data))
    out = bytearray()
    rate_out, ch_out = [0], [1]
    errs = []
    obuf = (C.c_ubyte * 65536)()
    done = C.c_size_t(0)
    while True:
        rc = _mpg.mpg123_read(C.c_void_p(h), obuf, 65536, C.byref(done))
        out += bytes(obuf[:done.value])
        if rc == -10:  # MPG123_NEED_MORE
            break
        if rc == -11:  # MPG123_NEW_FORMAT
            r = C.c_long(0); c = C.c_int(0); e = C.c_int(0)
            _mpg.mpg123_getformat(C.c_void_p(h), C.byref(r), C.byref(c), C.byref(e))
            rate_out[0], ch_out[0] = r.value, c.value
            continue
        if rc == -12:  # MPG123_DONE
            break
        if rc != 0:
            errs.append(_mpg.mpg123_plain_strerror(rc).decode())
            if len(errs) > 32: break
    _mpg.mpg123_delete(C.c_void_p(h))
    pcm = np.frombuffer(bytes(out), np.float32)
    return pcm, rate_out[0], ch_out[0], errs

if __name__ == "__main__":
    t = np.arange(32000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    mp3 = lame_encode(x, 16000, 32)
    print("lame bytes:", len(mp3), "header:", mp3[:4].hex())
    pcm, rate, ch, errs = mpg123_decode(mp3)
    print("decoded:", len(pcm), "rate", rate, "ch", ch, "errs", errs[:3])
    if len(pcm) > 4000:
        # SNR vs a delayed original (encoder delay): find best lag
        best = None
        for lag in range(0, 4000):
            y = pcm[lag:lag+16000]
            if len(y) < 16000: break
            r = np.corrcoef(y, x[:16000])[0,1]
            if best is None or r > best[1]: best = (lag, r)
        print("best lag", best)
