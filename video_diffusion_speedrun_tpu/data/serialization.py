"""Torch-free deserializer for torch.save'd tensors.

The reference dataset stores every latent as torch.save bytes and pays a full
`torch.load` per row (`/root/reference/sharded_dataset.py:8-13`). A TPU data
pipeline must not depend on torch at runtime, so this module parses the
torch.save zip container directly: `<archive>/data.pkl` (a restricted pickle
whose tensors are persistent-ID references) plus `<archive>/data/<key>` raw
little-endian storage buffers. Only plain tensors / containers are allowed —
a stricter surface than torch.load(weights_only=True).

numpy has no bfloat16; ml_dtypes (a JAX dependency) provides it, so bf16
latents deserialize with zero copies into arrays jax consumes directly.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import ml_dtypes
import numpy as np

_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "ComplexFloatStorage": np.dtype(np.complex64),
    "ComplexDoubleStorage": np.dtype(np.complex128),
}

# torch.storage.TypedStorage pickles as UntypedStorage + separate dtype in
# newer formats; dtype classes appear as torch.<name> instances.
_TORCH_DTYPE_NAMES: Dict[str, np.dtype] = {
    "float32": np.dtype(np.float32),
    "float64": np.dtype(np.float64),
    "float16": np.dtype(np.float16),
    "bfloat16": np.dtype(ml_dtypes.bfloat16),
    "int64": np.dtype(np.int64),
    "int32": np.dtype(np.int32),
    "int16": np.dtype(np.int16),
    "int8": np.dtype(np.int8),
    "uint8": np.dtype(np.uint8),
    "bool": np.dtype(np.bool_),
}


class _StorageTypeTag:
    """Stand-in for torch.XStorage classes referenced by the pickle."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)


class _Storage:
    """Raw little-endian buffer + dtype."""

    def __init__(self, data: bytes, dtype: np.dtype):
        self.array = np.frombuffer(data, dtype=dtype)


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    base = storage.array
    itemsize = base.dtype.itemsize
    if not size:
        if not 0 <= storage_offset < base.size:
            raise ValueError("tensor offset outside storage")
        return base[storage_offset].copy()
    # Validate extents BEFORE as_strided: these are untrusted dataset bytes,
    # and unvalidated strides would let as_strided read arbitrary process
    # memory (the contiguous-extent check alone does not cover
    # non-contiguous layouts).
    if len(stride) != len(size):
        raise ValueError("stride/shape rank mismatch")
    if storage_offset < 0 or any(s < 0 for s in stride):
        raise ValueError("negative offset/stride unsupported")
    if any(d == 0 for d in size):
        return np.zeros(tuple(size), base.dtype)
    last = storage_offset + sum((d - 1) * s for d, s in zip(size, stride))
    if last >= base.size:
        raise ValueError("tensor extents exceed storage")
    arr = np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


class _TorchFreeUnpickler(pickle.Unpickler):
    """Restricted unpickler: only tensor-rebuild machinery and containers."""

    _ALLOWED = {
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("collections", "OrderedDict"): OrderedDict,
    }

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTypeTag(name)
        if module == "torch" and name == "UntypedStorage":
            return _StorageTypeTag("ByteStorage")
        raise pickle.UnpicklingError(
            f"torch-free loader: refusing to load {module}.{name}"
        )

    def persistent_load(self, pid: Any) -> _Storage:
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        _, storage_type, key, _location, _numel = pid
        dtype = getattr(storage_type, "dtype", None) or np.dtype(np.uint8)
        data = self._zf.read(f"{self._prefix}/data/{key}")
        return _Storage(data, dtype)


try:  # native C++ fast path (data/_native/fastload.cpp); built via
    # scripts/build_native.sh — falls back to the Python parser below
    from video_diffusion_speedrun_tpu.data._native import fastload as _fastload
except ImportError:  # pragma: no cover - depends on build
    _fastload = None


def load_tensor(blob: bytes) -> np.ndarray:
    """Deserialize torch.save bytes → numpy array (bf16 via ml_dtypes).

    Drop-in torch-free replacement for the reference `deserialize_tensor`
    (`sharded_dataset.py:8-13`). Uses the native C++ parser when built."""
    if _fastload is not None:
        try:
            arr, is_bf16 = _fastload.load_tensor(blob)
            if is_bf16:
                arr = arr.view(ml_dtypes.bfloat16)
            return arr
        except ValueError:
            pass  # not a single plain tensor; use the general path
    obj = load_object(blob)
    if not isinstance(obj, np.ndarray):
        raise ValueError(f"expected a single tensor, got {type(obj)}")
    return obj


def load_object(blob: bytes) -> Any:
    """Deserialize torch.save bytes → nested containers of numpy arrays."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(
                "not a torch.save zip archive (legacy format unsupported)"
            )
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            return _TorchFreeUnpickler(f, zf, prefix).load()
