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
    "save_state_sharded",
    "load_state_sharded",
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
    np.savez(
        path,
        kind=np.array("permutation"),
        meta=np.array([FORMAT_VERSION, p.n], dtype=np.int64),
        perm=p.perm,
    )


def load_permutation(path) -> Permutation:
    with np.load(path) as z:
        _check_perm_entry(z, "")
        return Permutation(z["perm"])


def _check_perm_entry(z, prefix: str) -> None:
    """Validate a stored permutation's version + length (round-3 files carried
    no meta — treated as version 1, which is what they were written as)."""
    if f"{prefix}meta" in z.files:
        meta = z[f"{prefix}meta"]
        version, n = int(meta[0]), int(meta[1])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported csgn permutation version {version}")
        if n != len(z[f"{prefix}perm"]):
            raise ValueError(
                f"permutation length {len(z[f'{prefix}perm'])} != recorded n {n}"
            )


# -- whole-computation checkpoints ------------------------------------------

_SAVERS = {
    Ciphertext: ("ciphertext", lambda o: {"words": o.chunk_major(), "meta": _meta(o.ctx)}),
    SecretKey: ("secret_key", lambda o: {"indices": o.indices, "meta": _meta(o.ctx)}),
    Permutation: (
        "permutation",
        lambda o: {"perm": o.perm, "meta": np.array([FORMAT_VERSION, o.n], np.int64)},
    ),
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


# -- per-shard checkpoints ----------------------------------------------------
#
# `save_state` gathers every payload to one host array — fine for small
# states, but a chunk-sharded 10^6-chunk product would funnel through a
# single process, re-creating the memory bottleneck the chunk sharding
# exists to avoid.  The sharded format is a directory:
#
#   manifest.json            — version + per-ciphertext block table
#                              {name: {n, d, chunks, blocks: [[start, count,
#                              file], ...]}}, written by process 0
#   <name>.c<start>.npy      — chunk-major uint32[count, W] payload block,
#                              written by the process that OWNS those chunks
#   aux.npz                  — non-ciphertext objects (keys, permutations)
#                              via `save_state`, written by process 0
#
# Every process writes only its addressable, replica-0 shards; no process
# ever materializes the global array.  `load_state_sharded(dir, mesh=...)`
# re-lays the chunk axis onto ANY mesh via `jax.make_array_from_callback`:
# each process reads only the block ranges its new shards need (blocks are
# .npy files, memory-mapped).  Reference has no serialization at all
# (SURVEY.md §5); this is the multi-host half of the checkpoint story
# (fault_demo exercises it end to end).

MANIFEST = "manifest.json"


def save_state_sharded(dirpath, objects: dict) -> None:
    """Checkpoint {name: Ciphertext|SecretKey|Permutation} with ciphertext
    payloads written per-shard by their owning processes.

    Call from EVERY process of a multi-process job (like a collective); the
    caller is responsible for a barrier afterwards if cross-process
    visibility matters before proceeding (e.g. `sync_global_devices`).
    Ciphertexts must be canonical (sharded production payloads are; a lazy
    tag would need a gather to resolve, which this format exists to avoid).
    """
    import json
    import pathlib

    import jax

    p = pathlib.Path(dirpath)
    p.mkdir(parents=True, exist_ok=True)
    proc = jax.process_index()

    manifest: dict = {"version": FORMAT_VERSION, "entries": {}}
    aux: dict = {}
    for name, obj in objects.items():
        if "/" in name:
            raise ValueError(f"state name may not contain '/': {name!r}")
        if not isinstance(obj, Ciphertext):
            aux[name] = obj
            continue
        if not obj.is_canonical:
            raise ValueError(
                f"{name!r}: sharded checkpoint requires a canonical payload "
                "(resolve the order tag before checkpointing)"
            )
        wt = obj.wt
        w, c = wt.shape
        blocks = []
        if hasattr(wt, "addressable_shards") and hasattr(wt, "sharding"):
            # Global block table from the sharding (host-independent), files
            # from whichever process owns them.
            seen = set()
            for dev, index in wt.sharding.devices_indices_map((w, c)).items():
                rows = index[-2]
                if (rows.start or 0) != 0 or rows.stop not in (None, w):
                    # Blocks are deduped by column start and files named by it
                    # alone; a word-axis (or 2-D) sharding would make multiple
                    # shards write the same file with partial rows.
                    raise ValueError(
                        f"{name!r}: sharded checkpoint requires chunk-axis-only "
                        f"sharding (P(None, axis)); got a shard covering word "
                        f"rows [{rows.start}, {rows.stop}) of {w}"
                    )
                cols = index[-1]
                start = cols.start or 0
                stop = cols.stop if cols.stop is not None else c
                if start in seen:
                    continue  # replicated shard: one file
                seen.add(start)
                blocks.append([int(start), int(stop - start), f"{name}.c{start}.npy"])
            for sh in wt.addressable_shards:
                if sh.replica_id != 0:
                    continue
                start = sh.index[-1].start or 0
                np.save(p / f"{name}.c{start}.npy",
                        np.asarray(sh.data).T.astype(np.uint32))
        else:
            blocks.append([0, int(c), f"{name}.c0.npy"])
            if proc == 0:
                np.save(p / f"{name}.c0.npy", np.asarray(wt).T.astype(np.uint32))
        blocks.sort()
        manifest["entries"][name] = {
            "n": obj.ctx.n, "d": obj.ctx.d, "chunks": int(c), "blocks": blocks,
        }

    if proc == 0:
        if aux:
            save_state(p / "aux.npz", aux)
        (p / MANIFEST).write_text(json.dumps(manifest))


def load_state_sharded(dirpath, mesh=None, axis: str = "c") -> dict:
    """Load a `save_state_sharded` checkpoint.

    With ``mesh``, every ciphertext payload comes back as a global jax.Array
    sharded ``P(None, axis)`` over the mesh — each process reads ONLY the
    block ranges its new shards cover (mesh shape need not match the one the
    checkpoint was written on).  A chunk count that does not divide the new
    axis size is zero-padded up to it (pad chunks are canonical and
    parity-neutral, exactly as `parallel.shard_ciphertext` pads), so resume
    works on ANY mesh.  Without ``mesh``, payloads assemble to single-device
    arrays at their exact saved size.
    """
    import json
    import pathlib

    import jax
    import jax.numpy as jnp

    p = pathlib.Path(dirpath)
    manifest = json.loads((p / MANIFEST).read_text())
    if manifest["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported csgn checkpoint version {manifest['version']}")

    out: dict = {}
    if (p / "aux.npz").exists():
        out.update(load_state(p / "aux.npz"))

    for name, ent in manifest["entries"].items():
        ctx = Context(int(ent["n"]), int(ent["d"]))
        w, c = ctx.words32, int(ent["chunks"])
        blocks = [(int(s), int(cnt), p / f) for s, cnt, f in ent["blocks"]]

        def read_cols(col0: int, col1: int, _blocks=blocks, _w=w, _c=c) -> np.ndarray:
            """Assemble word-major [W, col1-col0] from overlapping blocks,
            reading only the needed rows of each memory-mapped block file.
            Columns at or beyond the saved chunk count are zero pad (resume
            onto a mesh that does not divide the chunk count)."""
            parts = []
            for start, cnt, f in _blocks:
                lo, hi = max(col0, start), min(col1, start + cnt)
                if lo >= hi:
                    continue
                blk = np.load(f, mmap_mode="r")
                parts.append(np.ascontiguousarray(blk[lo - start : hi - start].T))
            if col1 > _c and max(col0, _c) < col1:
                parts.append(np.zeros((_w, col1 - max(col0, _c)), np.uint32))
            got = np.concatenate(parts, axis=1) if parts else np.zeros((_w, 0), np.uint32)
            if got.shape[1] != col1 - col0:
                raise ValueError(f"{name!r}: blocks do not cover [{col0}, {col1})")
            return got

        if mesh is None:
            out[name] = Ciphertext(jnp.asarray(read_cols(0, c)), ctx)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P(None, axis))
            nd = mesh.shape[axis]
            cp = -(-c // nd) * nd  # pad to the new mesh (zero chunks)

            def cb(index, _cp=cp):
                cols = index[-1]
                start = cols.start or 0
                stop = cols.stop if cols.stop is not None else _cp
                return read_cols(start, stop)

            arr = jax.make_array_from_callback((w, cp), sharding, cb)
            out[name] = Ciphertext(arr, ctx)
    return out


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
                _check_perm_entry(z, f"{name}/")
                out[name] = Permutation(z[f"{name}/perm"])
            else:
                raise ValueError(f"unknown kind {kind!r} for {name!r}")
    return out
