"""ctypes introspection of the lavc amrwb decoder context (round-5
toolkit, reconstructed as a reusable lab): AVCodecContext.priv_data
(ctx+0x20) exposes AMRWBContext; known offsets (amrwbdec.asm):

  0x4b8  base_lag_int (uint8)      0x4b9  pitch_lag_int (uint8)
  0x4bc  excitation history (248 floats; current subframe at +184)
  0xaa8  fixed_vector[64] (sharpened, float)
  0xba8  prediction_error[4]       0xbb8  pitch_gain ring [6]
  0xbd0  fixed_gain  0xbd4 prev?   0xbd8  tilt  0xbe0 as_state (u8)
  0x1220 first_frame flag
"""

import ctypes as C
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "amr_oracle", "/root/repo/tools/amr_tables/oracle.py")
oracle = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(oracle)


class WBLab:
    def __init__(self):
        self.dec = oracle.Decoder(codec="amrwb", rate=16000)
        ctx = self.dec.ctx
        self.priv = C.cast(C.c_void_p(ctx + 0x20),
                           C.POINTER(C.c_void_p)).contents.value

    def decode(self, mode_idx, bits):
        return self.dec.decode(oracle.pack_frame(mode_idx, bits, wb=True))

    def f32(self, off, n):
        return np.frombuffer(C.string_at(self.priv + off, 4 * n),
                             np.float32).copy()

    def u8(self, off):
        return C.cast(C.c_void_p(self.priv + off),
                      C.POINTER(C.c_ubyte)).contents.value

    def fixed_vector(self):
        return self.f32(0xAA8, 64)

    def lag_bytes(self):
        return self.u8(0x4B8), self.u8(0x4B9)
