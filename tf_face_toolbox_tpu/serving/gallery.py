"""Device-resident enrollment gallery for the serving daemon.

The daemon's 1:N half (cli.search is the offline counterpart): enrolled
embeddings live on the device as one (capacity, D) array padded in
``block``-row steps, so the compiled cosine+top-k search program only
recompiles when capacity crosses a block boundary — enrolling is an
append + device_put, identifying is one MXU matmul.

Thread-safe (the HTTP front-end is threaded); the host keeps the master
copy so the gallery snapshots to an ordinary ``.npz`` (atomic
tmp+rename) and reloads at boot — the persistence model of the
reference era's "embeddings directory" workflows, one file instead.
"""

from __future__ import annotations

import functools
import os
import threading

import numpy as np


@functools.lru_cache(maxsize=None)
def _search_fn(k: int):
    """One cached jitted program per k (capacity/batch changes retrace
    inside jax's own cache; a fresh closure per call would not)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(g, p, n_valid):
        sims = jnp.dot(p, g.T, preferred_element_type=jnp.float32)
        row = jnp.arange(g.shape[0])
        sims = jnp.where(row[None, :] < n_valid, sims, -2e9)
        return jax.lax.top_k(sims, k)

    return run


class DeviceGallery:
    """Enroll/identify store over L2-normalized embeddings.

    ``block``: device capacity granularity (rows). Searches mask the
    padded tail with −2e9, so scores are exact at any fill level.
    """

    def __init__(self, dim: int, *, block: int = 1024):
        if dim < 1 or block < 1:
            raise ValueError(f"bad dim={dim} / block={block}")
        self.dim = int(dim)
        self.block = int(block)
        self._lock = threading.Lock()
        self._emb = np.zeros((0, dim), np.float32)
        self._labels = np.zeros((0,), np.int64)
        self._dev = None            # (capacity, D) device array

    def __len__(self) -> int:
        with self._lock:
            return self._emb.shape[0]

    def enroll(self, embeddings: np.ndarray, labels) -> int:
        """Append embeddings (N, D) with int labels (N,); → new size."""
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim == 1:
            embeddings = embeddings[None]
        labels = np.atleast_1d(np.asarray(labels, np.int64))
        if embeddings.shape != (labels.shape[0], self.dim):
            raise ValueError(
                f"embeddings {embeddings.shape} vs labels "
                f"{labels.shape} / dim {self.dim}")
        with self._lock:
            self._emb = np.concatenate([self._emb, embeddings])
            self._labels = np.concatenate([self._labels, labels])
            self._sync_locked()
            return self._emb.shape[0]

    def _sync_locked(self) -> None:
        import jax
        import jax.numpy as jnp

        n = self._emb.shape[0]
        cap = -(-max(n, 1) // self.block) * self.block
        padded = np.zeros((cap, self.dim), np.float32)
        padded[:n] = self._emb
        self._dev = jax.device_put(jnp.asarray(padded))

    def search(self, embeddings: np.ndarray, k: int = 5):
        """Top-``k`` matches per probe → (labels (B,k) int64,
        scores (B,k) f32). Probes and gallery are assumed
        L2-normalized (the extractor's output); ``k`` clamps to the
        current size."""
        import jax.numpy as jnp

        with self._lock:
            n = self._emb.shape[0]
            dev = self._dev
            labels = self._labels
        if n == 0:
            raise ValueError("gallery is empty — enroll first")
        k = min(int(k), n)
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        e = np.asarray(embeddings, np.float32)
        if e.ndim == 1:
            e = e[None]
        if e.shape[1] != self.dim:
            raise ValueError(f"probe dim {e.shape[1]} != {self.dim}")
        scores, idx = _search_fn(k)(dev, jnp.asarray(e), jnp.int32(n))
        idx = np.asarray(idx)
        return labels[idx], np.asarray(scores)

    def remove(self, label: int) -> int:
        """Drop every enrollment of ``label``; → rows removed. The
        device array re-syncs immediately (capacity only shrinks at
        block granularity, so usually no recompile)."""
        with self._lock:
            keep = self._labels != int(label)
            removed = int((~keep).sum())
            if removed:
                self._emb = self._emb[keep]
                self._labels = self._labels[keep]
                self._sync_locked()
            return removed

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> int:
        """Atomic snapshot → .npz; returns the row count written."""
        with self._lock:
            emb, labels = self._emb.copy(), self._labels.copy()
        tmp = path + ".tmp.npz"
        np.savez(tmp, embeddings=emb, labels=labels)
        os.replace(tmp, path)
        return emb.shape[0]

    @classmethod
    def load(cls, path: str, *, block: int = 1024) -> "DeviceGallery":
        data = np.load(path, allow_pickle=False)
        emb = np.asarray(data["embeddings"], np.float32)
        g = cls(emb.shape[1], block=block)
        if emb.shape[0]:
            g.enroll(emb, data["labels"])
        return g
