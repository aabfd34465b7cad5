"""ctypes bridge to the native support library.

Drop-in equivalent of the reference's CPPbridge (reference:
utils/library.py:433-580) — same method surface (GeometricFilter,
CreateMatcher/KnnMatch, query-node iteration, GeometricFilterFromMatcher,
FastMatCombi) — backed by gims_tpu/native/matchlib.cc. The shared library
is built on demand with `make` on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libgims_native.so"


def build_library(force: bool = False) -> str:
    if force or not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True,
        )
    return str(_LIB_PATH)


class CPPbridge:
    def __init__(self, lib_path: str | None = None):
        if lib_path is None:
            lib_path = build_library()
        self.lib = ctypes.cdll.LoadLibrary(lib_path)
        self.MatcherPtr = None
        self.last_i1_list = np.empty(0, dtype=ctypes.c_int)
        self.last_i2_list = np.empty(0, dtype=ctypes.c_int)

        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        bp = ctypes.POINTER(ctypes.c_bool)
        L = self.lib
        L.GeometricFilter.argtypes = [
            fp, fp, bp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_bool,
        ]
        L.GeometricFilter.restype = None
        L.GeometricFilterFromNodes.argtypes = [
            ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_bool,
        ]
        L.GeometricFilterFromNodes.restype = None
        L.NumberOfFilteredMatches.argtypes = [ctypes.c_void_p]
        L.NumberOfFilteredMatches.restype = ctypes.c_int
        L.ArrayOfFilteredMatches.argtypes = [ctypes.c_void_p, ip]
        L.ArrayOfFilteredMatches.restype = None
        L.newMatcher.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_float]
        L.newMatcher.restype = ctypes.c_void_p
        L.deleteMatcher.argtypes = [ctypes.c_void_p]
        L.KnnMatcher.argtypes = [
            ctypes.c_void_p, fp, fp, ctypes.c_int, fp, fp, ctypes.c_int,
            ctypes.c_int,
        ]
        L.KnnMatcher.restype = None
        L.GetQueryNodeLength.argtypes = [ctypes.c_void_p]
        L.GetQueryNodeLength.restype = ctypes.c_int
        L.GetData_from_QueryNode.argtypes = [ctypes.c_void_p, ip, ip, fp]
        L.GetData_from_QueryNode.restype = None
        for name in ("FirstQueryNode", "LastQueryNode"):
            getattr(L, name).argtypes = [ctypes.c_void_p]
            getattr(L, name).restype = ctypes.c_void_p
        for name in ("NextQueryNode", "PrevQueryNode"):
            getattr(L, name).argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            getattr(L, name).restype = ctypes.c_void_p
        L.FastMatCombi.argtypes = [
            ctypes.c_int, fp, ip, ip, fp, fp, ctypes.c_int, ip, ip,
        ]
        L.FastMatCombi.restype = None

    # --- geometric filtering (reference: library.py:480-496) ---
    def GeometricFilter(self, scr_pts, im1, dts_pts, im2, Filer="ORSA_H",
                        precision=10, verb=False):
        filercode = 1 if Filer == "ORSA_F" else 0
        scr = np.ascontiguousarray(scr_pts, dtype=np.float32).reshape(-1)
        dts = np.ascontiguousarray(dts_pts, dtype=np.float32).reshape(-1)
        n = len(scr) // 2
        mask = np.zeros(n, dtype=ctypes.c_bool)
        T = np.zeros(9, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        bp = ctypes.POINTER(ctypes.c_bool)
        h1, w1 = im1.shape[:2]
        h2, w2 = im2.shape[:2]
        self.lib.GeometricFilter(
            scr.ctypes.data_as(fp), dts.ctypes.data_as(fp),
            mask.ctypes.data_as(bp), T.ctypes.data_as(fp),
            n, w1, h1, w2, h2, filercode, ctypes.c_float(precision), verb,
        )
        return mask.astype(bool), T.astype(np.float64).reshape(3, 3)

    # --- KNN matching (reference: library.py:542-558) ---
    def CreateMatcher(self, desc_dim, k=1, sim_thres=0.7):
        self.MatcherPtr = self.lib.newMatcher(k, desc_dim,
                                              ctypes.c_float(sim_thres))

    def KnnMatch(self, Qkps, Qdesc, Tkps, Tdesc, FastCode=0):
        """Qkps/Tkps: (N,2) arrays (or cv2 keypoint lists)."""
        fp = ctypes.POINTER(ctypes.c_float)
        qk = _kps_to_array(Qkps)
        tk = _kps_to_array(Tkps)
        qd = np.ascontiguousarray(Qdesc, np.float32)
        td = np.ascontiguousarray(Tdesc, np.float32)
        self.lib.KnnMatcher(
            self.MatcherPtr, qk.ctypes.data_as(fp), qd.ctypes.data_as(fp),
            len(qd), tk.ctypes.data_as(fp), td.ctypes.data_as(fp),
            len(td), FastCode,
        )

    def GetMatches_from_QueryNode(self, qn):
        n = self.lib.GetQueryNodeLength(qn)
        if n <= 0:
            return []
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        qidx = np.zeros(1, dtype=np.int32)
        tidx = np.zeros(n, dtype=np.int32)
        sims = np.zeros(n, dtype=np.float32)
        self.lib.GetData_from_QueryNode(
            qn, qidx.ctypes.data_as(ip), tidx.ctypes.data_as(ip),
            sims.ctypes.data_as(fp),
        )
        return [(int(qidx[0]), int(tidx[i]), float(sims[i]))
                for i in range(n)]

    def FirstLast_QueryNodes(self):
        return (self.lib.FirstQueryNode(self.MatcherPtr),
                self.lib.LastQueryNode(self.MatcherPtr))

    def NextQueryNode(self, qn):
        return self.lib.NextQueryNode(self.MatcherPtr, qn)

    def PrevQueryNode(self, qn):
        return self.lib.PrevQueryNode(self.MatcherPtr, qn)

    def all_matches(self):
        """Convenience: iterate all query nodes -> [(q, t, dist), ...]."""
        out = []
        first, last = self.FirstLast_QueryNodes()
        qn = first
        while qn:
            out.extend(self.GetMatches_from_QueryNode(qn))
            if qn == last:
                break
            qn = self.NextQueryNode(qn)
        return out

    def GeometricFilterFromMatcher(self, im1, im2, Filer="ORSA_H",
                                   precision=24, verb=False):
        filercode = 1 if Filer == "ORSA_F" else 0
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        T = np.zeros(9, dtype=np.float32)
        h1, w1 = im1.shape[:2]
        h2, w2 = im2.shape[:2]
        self.lib.GeometricFilterFromNodes(
            self.MatcherPtr, T.ctypes.data_as(fp), w1, h1, w2, h2,
            filercode, ctypes.c_float(precision), verb,
        )
        nfm = self.lib.NumberOfFilteredMatches(self.MatcherPtr)
        fm = np.zeros(3 * nfm, dtype=np.int32)
        self.lib.ArrayOfFilteredMatches(self.MatcherPtr,
                                        fm.ctypes.data_as(ip))
        matches = [(int(fm[3 * i]), int(fm[3 * i + 1]), int(fm[3 * i + 2]))
                   for i in range(nfm)]
        return matches, T.astype(np.float64).reshape(3, 3)

    # --- FastMatCombi (reference: library.py:560-580) ---
    def PrepareForFastMatCombi(self, len_i_list):
        self.last_i1_list = -1 * np.ones(len_i_list, dtype=ctypes.c_int)
        self.last_i2_list = -1 * np.ones(len_i_list, dtype=ctypes.c_int)

    def FastMatCombi(self, bP, i_list, ps1, j_list, ps2, MemStepImg,
                     MemStepBlock=0):
        ip = ctypes.POINTER(ctypes.c_int)
        fp = ctypes.POINTER(ctypes.c_float)
        i1 = np.ascontiguousarray(i_list, np.int32)
        i2 = np.ascontiguousarray(j_list, np.int32)
        self.lib.FastMatCombi(
            len(self.last_i1_list), bP.ctypes.data_as(fp),
            i1.ctypes.data_as(ip), i2.ctypes.data_as(ip),
            ps1.ctypes.data_as(fp), ps2.ctypes.data_as(fp),
            ctypes.c_int(MemStepImg),
            self.last_i1_list.ctypes.data_as(ip),
            self.last_i2_list.ctypes.data_as(ip),
        )
        self.last_i1_list = i1.copy()
        self.last_i2_list = i2.copy()


def _kps_to_array(kps):
    if isinstance(kps, np.ndarray):
        return np.ascontiguousarray(kps, np.float32).reshape(-1)
    return np.array([c for kp in kps for c in kp.pt], np.float32)
