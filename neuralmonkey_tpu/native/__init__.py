"""Native host-pipeline kernels: build-on-demand ctypes bindings.

The TPU compute path is JAX/XLA/Pallas; this package natively
implements the HOST hot loops of the data pipeline (the role
subword_nmt + TF's C++ feed runtime played for the reference):

- BPE application (`NativeBPE` — processors/bpe.py's inner loop)
- vocabulary id-encoding (`NativeVocab` — vocabulary.py's
  sentences_to_tensor fill loop)

``nm_native.cpp`` compiles to a shared library on first use (g++,
cached next to the source or under ``~/.cache/neuralmonkey_tpu``) and
loads through ctypes — no pybind11/cffi dependency. Python remains
the reference implementation and the silent fallback: set
``NM_NATIVE=0`` to force it, and every native call path is golden-
tested byte-equal against the Python one (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..logging import debug, warn

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "nm_native.cpp")


def _candidate_lib_dirs() -> List[str]:
    # NOT inside the package tree: pkgutil-based tooling (the type
    # tier, doc generators) would try to import a co-located .so as a
    # Python extension module
    custom = os.environ.get("NM_NATIVE_CACHE")
    dirs = [custom] if custom else []
    return dirs + [os.path.join(os.path.expanduser("~"), ".cache",
                                "neuralmonkey_tpu")]


def _build(src: str, out: str) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
           "-o", tmp]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed: {proc.stderr[-500:]}")
    os.replace(tmp, out)  # atomic under concurrent builders


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_char_p, c_void_p, c_int32 = (ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int32)
    lib.nm_free.argtypes = [c_void_p]
    lib.nm_bpe_new.argtypes = [c_char_p, c_char_p, c_int32, c_int32]
    lib.nm_bpe_new.restype = c_void_p
    lib.nm_bpe_free.argtypes = [c_void_p]
    # restype stays c_void_p (NOT c_char_p) so the pointer survives
    # for nm_free; decoded manually via ctypes.string_at
    lib.nm_bpe_encode_lines.argtypes = [c_void_p, c_char_p]
    lib.nm_bpe_encode_lines.restype = c_void_p
    lib.nm_vocab_new.argtypes = [c_char_p]
    lib.nm_vocab_new.restype = c_void_p
    lib.nm_vocab_free.argtypes = [c_void_p]
    lib.nm_vocab_measure.argtypes = [
        c_char_p, c_int32, ctypes.POINTER(c_int32),
        ctypes.POINTER(c_int32)]
    lib.nm_vocab_encode.argtypes = [
        c_void_p, c_char_p, c_int32, c_int32, c_int32, c_int32,
        c_int32, ctypes.POINTER(c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(c_int32),
        ctypes.POINTER(ctypes.c_int64)]
    return lib


def _load_or_build() -> ctypes.CDLL:
    src = _source_path()
    src_mtime = os.path.getmtime(src)
    errors = []
    for d in _candidate_lib_dirs():
        out = os.path.join(d, "_nm_native.so")
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < src_mtime):
                _build(src, out)
            return _declare(ctypes.CDLL(out))
        except (OSError, RuntimeError, subprocess.SubprocessError) as e:
            errors.append(f"{out}: {e}")
    raise RuntimeError("; ".join(errors))


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (disabled / unbuildable)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        if os.environ.get("NM_NATIVE") == "0":
            _LIB, _TRIED = None, True
            return None
        try:
            _LIB = _load_or_build()
            debug("native host kernels loaded", "native")
        except (RuntimeError, OSError) as exc:
            warn(f"native host kernels unavailable, using Python "
                 f"fallbacks ({exc})")
            _LIB = None
        _TRIED = True
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _clean(token: str) -> bool:
    return " " not in token and "\n" not in token


class NativeBPE:
    """BPE application through the native codec.

    Byte-exact with processors/bpe.BPECodec (golden-tested); tokens
    containing the blob delimiters (space/newline) must take the
    Python path — callers check with :func:`tokens_clean` /
    :func:`word_clean`. The intended dispatch keeps Python's per-word
    cache in FRONT: dict hits beat the FFI round-trip, so native
    handles only cache misses (where the merge loop dominates)."""

    def __init__(self, codes: Dict[Tuple[str, str], int],
                 separator: str, version: Tuple[int, ...]) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        ordered = sorted(codes, key=codes.get)
        blob = "\n".join(f"{a} {b}" for a, b in ordered)
        ver = tuple(version) + (0, 0)
        self._handle = lib.nm_bpe_new(
            blob.encode("utf-8"), separator.encode("utf-8"),
            int(ver[0]), int(ver[1]))

    @staticmethod
    def tokens_clean(sentence: Sequence[str]) -> bool:
        return all(_clean(t) for t in sentence)

    word_clean = staticmethod(_clean)

    def encode(self, sentence: Sequence[str]) -> List[str]:
        ptr = self._lib.nm_bpe_encode_lines(
            self._handle, " ".join(sentence).encode("utf-8"))
        try:
            out = ctypes.string_at(ptr).decode("utf-8")
        finally:
            self._lib.nm_free(ptr)
        return out.split(" ") if out else []

    def encode_word(self, word: str) -> List[str]:
        return self.encode((word,))

    def encode_words(self, words: Sequence[str]) -> List[List[str]]:
        """Encode N independent words in ONE call (each word rides as
        its own line) — the cache-miss batch path."""
        ptr = self._lib.nm_bpe_encode_lines(
            self._handle, "\n".join(words).encode("utf-8"))
        try:
            out = ctypes.string_at(ptr).decode("utf-8")
        finally:
            self._lib.nm_free(ptr)
        return [line.split(" ") if line else []
                for line in out.split("\n")]

    def __del__(self):
        lib, handle = getattr(self, "_lib", None), \
            getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.nm_bpe_free(handle)


class NativeVocab:
    """Batch token->id encoding through the native vocabulary.

    Mirrors vocabulary.sentences_to_tensor exactly for the
    non-unk-sampling path (train-time unk sampling stays in Python —
    it draws from Python's `random`)."""

    def __init__(self, index_to_word: Sequence[str]) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        if any(not _clean(w) for w in index_to_word):
            raise RuntimeError("vocabulary contains delimiter bytes")
        self._lib = lib
        blob = "\n".join(index_to_word)
        self._handle = lib.nm_vocab_new(blob.encode("utf-8"))

    def encode(self, sentences: Sequence[Sequence[str]],
               tgt_len: int, max_len: Optional[int],
               add_start: bool, add_end: bool
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(ids, mask) — or None when the blob could not faithfully
        carry the input (tokens containing space/newline, or
        empty-string tokens, which Python encodes as <unk>): the C
        side reports the row/token counts it actually saw, and any
        mismatch with len(sentences)/sum(len(s)) means fall back.
        This replaces a per-token Python-side cleanliness scan that
        cost more than the native win."""
        batch = len(sentences)
        ids = np.zeros((batch, tgt_len), dtype=np.int32)  # PAD = 0
        mask = np.zeros((batch, tgt_len), dtype=np.float32)
        text = "\n".join(" ".join(s) for s in sentences)
        rows = ctypes.c_int32(0)
        tokens = ctypes.c_int64(0)
        self._lib.nm_vocab_encode(
            self._handle, text.encode("utf-8"), batch, tgt_len,
            -1 if max_len is None else int(max_len),
            int(add_start), int(add_end),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(rows), ctypes.byref(tokens))
        if (rows.value != batch
                or tokens.value != sum(len(s) for s in sentences)):
            return None
        return ids, mask

    def __del__(self):
        lib, handle = getattr(self, "_lib", None), \
            getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.nm_vocab_free(handle)
