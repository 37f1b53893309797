"""ctypes bindings for the native ETL library (native/fastetl.cpp).

Builds ``libfastetl.so`` on first use (g++, cached next to the source) and
falls back to pure Python transparently when a compiler isn't available.
See the .cpp header for the tokenization contract (pre-lowercased input,
reference-regex ASCII semantics).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("newsreclib_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastetl.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "fastetl.cpp")

_lib = None
_lib_tried = False


def _build_lib() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC_PATH):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("fastetl native build failed (%s); using Python fallback", e)
        return None


def get_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fe_make_strmap.restype = ctypes.c_void_p
    lib.fe_make_strmap.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.fe_free_strmap.argtypes = [ctypes.c_void_p]
    lib.fe_strmap_size.restype = ctypes.c_int64
    lib.fe_strmap_size.argtypes = [ctypes.c_void_p]
    for fname, extra in (
        ("fe_tokenize_ids", [ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_int32)]),
        ("fe_parse_impressions", [ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int32)]),
        ("fe_parse_id_list", [ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int32)]),
    ):
        f = getattr(lib, fname)
        f.restype = ctypes.c_int64
        f.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ] + extra
    _lib = lib
    return _lib


def _blob(strings: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    encoded = [s.encode("utf-8") for s in strings]
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets


class StrMap:
    """Native string→int32 map (vocab / nid2row)."""

    def __init__(self, mapping: Dict[str, int]):
        self._py = mapping
        self._handle = None
        lib = get_lib()
        if lib is not None:
            blob, offsets = _blob(list(mapping.keys()))
            values = np.fromiter(mapping.values(), dtype=np.int32, count=len(mapping))
            self._handle = lib.fe_make_strmap(
                blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(mapping),
            )
            self._lib = lib

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.fe_free_strmap(self._handle)

    @property
    def native(self) -> bool:
        return self._handle is not None


def tokenize_ids(
    texts: Sequence[str], vocab: StrMap, cap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """texts (pre-lowercased) → (n, cap) int32 ids + (n,) lengths."""
    n = len(texts)
    out = np.zeros((n, cap), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    if vocab.native:
        blob, offsets = _blob(texts)
        vocab._lib.fe_tokenize_ids(
            vocab._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, lens
    from newsreclib_tpu.data.tokenize import word_tokenize

    for i, t in enumerate(texts):
        ids = [vocab._py.get(tok, 0) for tok in word_tokenize(t)][:cap]
        out[i, : len(ids)] = ids
        lens[i] = len(ids)
    return out, lens


def parse_impressions(
    lines: Sequence[str], nidmap: StrMap, cap: int = 512
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """'N1-0 N2-1 ...' lines → (n, cap) rows, (n, cap) labels, (n,) lens."""
    n = len(lines)
    rows = np.zeros((n, cap), dtype=np.int32)
    labels = np.zeros((n, cap), dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    if nidmap.native:
        blob, offsets = _blob(lines)
        nidmap._lib.fe_parse_impressions(
            nidmap._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), cap,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return rows, labels, lens
    for i, line in enumerate(lines):
        c = 0
        for item in line.split():
            nid, _, lab = item.rpartition("-")
            if nid and lab and c < cap:
                rows[i, c] = nidmap._py.get(nid, 0)
                labels[i, c] = int(lab)
                c += 1
        lens[i] = c
    return rows, labels, lens


def parse_id_lists(
    lines: Sequence[str], nidmap: StrMap, cap: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """space-separated id lines → (n, cap) rows + (n,) lens."""
    n = len(lines)
    rows = np.zeros((n, cap), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    if nidmap.native:
        blob, offsets = _blob(lines)
        nidmap._lib.fe_parse_id_list(
            nidmap._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return rows, lens
    for i, line in enumerate(lines):
        ids = [nidmap._py.get(x, 0) for x in line.split()][:cap]
        rows[i, : len(ids)] = ids
        lens[i] = len(ids)
    return rows, lens
