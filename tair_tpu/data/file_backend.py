"""Pluggable byte-reading backends for dataset IO.

Counterpart of /root/reference/terediff/dataset/file_backend.py:9-120
(HardDiskBackend + PetrelBackend). The disk backend is the one the TAIR
path uses; the S3/Petrel client is environment-specific, so here it is an
explicit stub that fails loudly at construction, and a MemoryBackend is
added for hermetic tests (the reference tests against real files only).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union


class BaseBackend:
    def get(self, filepath: Union[str, Path]) -> bytes:
        raise NotImplementedError


class HardDiskBackend(BaseBackend):
    """Raw bytes from the local filesystem."""

    def get(self, filepath: Union[str, Path]) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()


class MemoryBackend(BaseBackend):
    """In-memory {path: bytes} store for tests and synthetic data."""

    def __init__(self, store: Dict[str, bytes] | None = None):
        self.store = dict(store or {})

    def put(self, filepath: Union[str, Path], data: bytes) -> None:
        self.store[str(filepath)] = data

    def get(self, filepath: Union[str, Path]) -> bytes:
        return self.store[str(filepath)]


class PetrelBackend(BaseBackend):
    """S3-style object storage via the petrel client (unavailable in this
    environment; kept as the configuration seam the reference exposes)."""

    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "PetrelBackend requires the petrel_client package and cluster "
            "credentials; use HardDiskBackend (default) in this environment"
        )


_BACKENDS = {
    "disk": HardDiskBackend,
    "memory": MemoryBackend,
    "petrel": PetrelBackend,
}


def get_backend(name: str, **kwargs) -> BaseBackend:
    try:
        cls = _BACKENDS[name]
    except KeyError:
        raise ValueError(
            f"unknown file backend {name!r}; choose from {sorted(_BACKENDS)}"
        ) from None
    return cls(**kwargs)
