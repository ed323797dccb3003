"""Serialization & checkpoint/resume.

The reference has **no serialization at all** (SURVEY.md §5 — its size()
methods only count bytes).  This module defines the framework's stable
on-disk layout so long multiplication chains can be checkpointed and resumed
(and resharded on resume):

  * Payload: chunk-major uint32 words (`[chunks, W]`) — host/serialization
    order; the device-side word-major layout is an internal detail.
  * Metadata: n, d, chunk count, format version.
  * Container: .npz (zip of .npy arrays) — self-describing, mmap-friendly,
    no external deps.

`save_state`/`load_state` bundle many named objects (ciphertexts, keys,
permutations) into one checkpoint file for a whole computation.
"""

from __future__ import annotations


import numpy as np

from csgn_tpu.ciphertext import Ciphertext
from csgn_tpu.context import Context
from csgn_tpu.permutation import Permutation
from csgn_tpu.secret_key import SecretKey

__all__ = [
    "save_ciphertext",
    "load_ciphertext",
    "save_secret_key",
    "load_secret_key",
    "save_permutation",
    "load_permutation",
    "save_state",
    "load_state",
]

FORMAT_VERSION = 1


def _meta(ctx: Context) -> np.ndarray:
    return np.array([FORMAT_VERSION, ctx.n, ctx.d], dtype=np.int64)


def _ctx_from_meta(meta: np.ndarray) -> Context:
    version, n, d = (int(x) for x in meta[:3])
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported csgn checkpoint version {version}")
    return Context(n, d)


# -- single objects ---------------------------------------------------------


def save_ciphertext(path, ct: Ciphertext) -> None:
    np.savez(path, kind=np.array("ciphertext"), meta=_meta(ct.ctx), words=ct.chunk_major())


def load_ciphertext(path) -> Ciphertext:
    with np.load(path) as z:
        ctx = _ctx_from_meta(z["meta"])
        return Ciphertext.from_chunk_major(z["words"], ctx)


def save_secret_key(path, sk: SecretKey) -> None:
    np.savez(path, kind=np.array("secret_key"), meta=_meta(sk.ctx), indices=sk.indices)


def load_secret_key(path) -> SecretKey:
    with np.load(path) as z:
        ctx = _ctx_from_meta(z["meta"])
        return SecretKey(ctx, z["indices"])


def save_permutation(path, p: Permutation) -> None:
    np.savez(path, kind=np.array("permutation"), perm=p.perm)


def load_permutation(path) -> Permutation:
    with np.load(path) as z:
        return Permutation(z["perm"])


# -- whole-computation checkpoints ------------------------------------------

_SAVERS = {
    Ciphertext: ("ciphertext", lambda o: {"words": o.chunk_major(), "meta": _meta(o.ctx)}),
    SecretKey: ("secret_key", lambda o: {"indices": o.indices, "meta": _meta(o.ctx)}),
    Permutation: ("permutation", lambda o: {"perm": o.perm}),
}


def save_state(path, objects: dict) -> None:
    """Checkpoint a dict of {name: Ciphertext|SecretKey|Permutation}."""
    arrays: dict[str, np.ndarray] = {}
    for name, obj in objects.items():
        if "/" in name:
            raise ValueError(f"state name may not contain '/': {name!r}")
        for klass, (kind, fn) in _SAVERS.items():
            if isinstance(obj, klass):
                arrays[f"{name}/kind"] = np.array(kind)
                for field, arr in fn(obj).items():
                    arrays[f"{name}/{field}"] = arr
                break
        else:
            raise TypeError(f"cannot checkpoint object of type {type(obj)}")
    np.savez(path, **arrays)


def load_state(path) -> dict:
    """Load a checkpoint written by `save_state`."""
    out: dict = {}
    with np.load(path) as z:
        names = sorted({k.split("/", 1)[0] for k in z.files})
        for name in names:
            kind = str(z[f"{name}/kind"])
            if kind == "ciphertext":
                ctx = _ctx_from_meta(z[f"{name}/meta"])
                out[name] = Ciphertext.from_chunk_major(z[f"{name}/words"], ctx)
            elif kind == "secret_key":
                ctx = _ctx_from_meta(z[f"{name}/meta"])
                out[name] = SecretKey(ctx, z[f"{name}/indices"])
            elif kind == "permutation":
                out[name] = Permutation(z[f"{name}/perm"])
            else:
                raise ValueError(f"unknown kind {kind!r} for {name!r}")
    return out
