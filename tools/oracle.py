"""ctypes wrapper around the reference-model oracle library.

The oracle (built by ``tools/build_oracle.sh`` into /tmp/oracle, OUTSIDE the
repo) compiles the reference C++ physics with a stubbed N_Vector so the exact
reference RHS can be called from Python.  It is used only to GENERATE golden
test fixtures (committed as .npz under tests/golden/); the shud_tpu package
never links against it.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

LIB_PATH = "/tmp/oracle/liboracle.so"
WS_PATH = "/tmp/oracle/ws"


class Oracle:
    def __init__(self, project: str, lib_path: str = LIB_PATH, ws: str = WS_PATH):
        os.chdir(ws)
        self.lib = ctypes.CDLL(lib_path)
        self.lib.oracle_init.argtypes = [ctypes.c_char_p]
        self.lib.oracle_get.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
        self.lib.oracle_set.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
        self.lib.oracle_f.argtypes = [
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        self.lib.oracle_update_forcing.argtypes = [ctypes.c_double]
        self.lib.oracle_et.argtypes = [ctypes.c_double, ctypes.c_double]
        self.lib.oracle_solar.restype = ctypes.c_double
        self.lib.oracle_solar.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        rc = self.lib.oracle_init(project.encode())
        assert rc == 0
        ne = ctypes.c_int(); nr = ctypes.c_int(); ns = ctypes.c_int()
        nl = ctypes.c_int(); ny = ctypes.c_int()
        self.lib.oracle_dims(*(ctypes.byref(v) for v in (ne, nr, ns, nl, ny)))
        self.ne, self.nr, self.ns, self.nl, self.ny = (
            ne.value, nr.value, ns.value, nl.value, ny.value,
        )
        self._sizes = {}

    def _ptr(self, a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def get(self, name: str, n: int | None = None) -> np.ndarray:
        if n is None:
            n = self._sizes.get(name, self.ny)
        buf = np.zeros(n)
        got = self.lib.oracle_get(name.encode(), self._ptr(buf))
        if got < 0:
            raise KeyError(name)
        self._sizes[name] = got
        return buf[:got]

    def set(self, name: str, val: np.ndarray) -> None:
        val = np.ascontiguousarray(val, dtype=np.float64)
        rc = self.lib.oracle_set(name.encode(), self._ptr(val))
        if rc < 0:
            raise KeyError(name)

    def y0(self) -> np.ndarray:
        out = np.zeros(self.ny)
        self.lib.oracle_get_y0(self._ptr(out))
        return out

    def qele_edges(self):
        surf = np.zeros(self.ne * 3)
        sub = np.zeros(self.ne * 3)
        self.lib.oracle_get_qele_edges(self._ptr(surf), self._ptr(sub))
        return surf.reshape(self.ne, 3), sub.reshape(self.ne, 3)

    def update_forcing(self, t: float):
        self.lib.oracle_update_forcing(t)

    def et(self, t: float, tout: float):
        self.lib.oracle_et(t, tout)

    def f(self, t: float, y: np.ndarray) -> np.ndarray:
        y = np.ascontiguousarray(y, dtype=np.float64)
        dy = np.zeros_like(y)
        self.lib.oracle_f(t, self._ptr(y), self._ptr(dy))
        return dy

    def _get_field(self, fn, name: str, n: int) -> np.ndarray:
        buf = np.zeros(n)
        got = fn(name.encode(), self._ptr(buf))
        if got < 0:
            raise KeyError(name)
        return buf[:got]

    def ele_field(self, name: str) -> np.ndarray:
        return self._get_field(self.lib.oracle_get_ele_field, name, self.ne)

    def riv_field(self, name: str) -> np.ndarray:
        return self._get_field(self.lib.oracle_get_riv_field, name, self.nr)

    def seg_field(self, name: str) -> np.ndarray:
        return self._get_field(self.lib.oracle_get_seg_field, name, self.ns)

    def solar(self, t: float, lat: float, lon: float):
        az = ctypes.c_double(); decl = ctypes.c_double()
        cosz = self.lib.oracle_solar(t, lat, lon, ctypes.byref(az), ctypes.byref(decl))
        return cosz, az.value, decl.value
