"""Virtual ciphertext circuits: +/* DAGs evaluated key-side without growth.

Decryption is a ring homomorphism from (ciphertexts, +, *) onto (F2, xor, and)
(reference src/SecretKey.cpp:126-146: the parity of a concatenation is the xor
of parities; the parity of a chunk cross-product is the and):

    Dec(a + b) = Dec(a) ^ Dec(b)        Dec(a * b) = Dec(a) & Dec(b)

So the key holder can decrypt ANY +/* circuit of ciphertexts in O(sum of leaf
chunks) — decrypt each distinct leaf once, fold bits through the DAG — while
the *materialized* ciphertext would have product-of-chunk-counts chunks.  A
32-deep multiply chain of 2-chunk inputs materializes to 2^32 chunks (687 GB
at Context(1247,16), beyond one chip's HBM); its `CtExpr` decrypts in
milliseconds from the 32 fresh leaves.

`CtExpr` is the lazy counterpart of `Ciphertext`: the same operator surface
(+, *, apply_permutation), no device work until `materialize()`.  Evaluation
is iterative (explicit stack) and memoized on node identity, so shared
subexpressions — true DAGs, not just trees — cost one visit, and depth is not
limited by Python recursion.

Non-key-holders cannot fold chunks (a chunk's decrypt bit is keyed), which is
why this lives next to `SecretKey.decrypt_product`/`recrypt` as the key-side
escape hatch for the scheme's bounded (superlinear-growth) multiplication.
"""

from __future__ import annotations

import dataclasses
import typing

from csgn_tpu.ciphertext import Ciphertext

if typing.TYPE_CHECKING:
    from csgn_tpu.permutation import Permutation

__all__ = ["CtExpr", "lift"]


def lift(x: "Ciphertext | CtExpr") -> "CtExpr":
    """Wrap a Ciphertext as a leaf expression (no-op on expressions)."""
    if isinstance(x, CtExpr):
        return x
    if isinstance(x, Ciphertext):
        return CtExpr(op="leaf", ct=x, args=(), chunks=x.chunks)
    raise TypeError(f"cannot lift {type(x).__name__} into a circuit")


@dataclasses.dataclass(frozen=True)
class CtExpr:
    """A +/* DAG over ciphertext leaves; `chunks` is the materialized size."""

    op: str                       # "leaf" | "add" | "mul"
    ct: Ciphertext | None         # leaf payload
    args: tuple["CtExpr", ...]    # operands for add/mul
    chunks: int                   # chunk count of the materialized equivalent

    # -- construction ---------------------------------------------------------

    def __add__(self, other: "Ciphertext | CtExpr") -> "CtExpr":
        other = lift(other)
        return CtExpr("add", None, (self, other), self.chunks + other.chunks)

    __radd__ = __add__

    def __mul__(self, other: "Ciphertext | CtExpr") -> "CtExpr":
        other = lift(other)
        return CtExpr("mul", None, (self, other), self.chunks * other.chunks)

    __rmul__ = __mul__

    def apply_permutation(self, p: "Permutation") -> "CtExpr":
        """Permutation distributes over +/* chunk-wise (it permutes bits
        within every chunk), so it pushes down to the leaves for free."""
        return _map_leaves(self, lambda ct: ct.apply_permutation(p))

    # -- accounting -----------------------------------------------------------

    @property
    def nbytes_materialized(self) -> int:
        """Payload bytes the materialized ciphertext would occupy."""
        ctx = self._any_leaf().ctx
        return ctx.chunk_count_bytes(self.chunks)

    def leaves(self) -> list[Ciphertext]:
        """Distinct leaf ciphertexts (by identity), post-order."""
        out: list[Ciphertext] = []
        seen: set[int] = set()
        for node in _postorder(self):
            if node.op == "leaf" and id(node.ct) not in seen:
                seen.add(id(node.ct))
                out.append(node.ct)  # type: ignore[arg-type]
        return out

    def _any_leaf(self) -> Ciphertext:
        node = self
        while node.op != "leaf":
            node = node.args[0]
        assert node.ct is not None
        return node.ct

    # -- evaluation -----------------------------------------------------------

    def fold(self, leaf_fn) -> int:
        """Evaluate the DAG in F2 with ``leaf_fn(ct) -> int`` at the leaves
        (add = xor, mul = and), memoized on node identity."""
        memo: dict[int, int] = {}
        leaf_memo: dict[int, int] = {}
        for node in _postorder(self):
            if node.op == "leaf":
                k = id(node.ct)
                if k not in leaf_memo:
                    leaf_memo[k] = int(leaf_fn(node.ct)) & 1
                memo[id(node)] = leaf_memo[k]
            elif node.op == "add":
                memo[id(node)] = memo[id(node.args[0])] ^ memo[id(node.args[1])]
            else:
                memo[id(node)] = memo[id(node.args[0])] & memo[id(node.args[1])]
        return memo[id(self)]

    def materialize(self) -> Ciphertext:
        """Fold the DAG into a real Ciphertext (the public, growth-paying
        evaluation; bit-exact to applying the operators directly)."""
        memo: dict[int, Ciphertext] = {}
        for node in _postorder(self):
            if node.op == "leaf":
                memo[id(node)] = node.ct  # type: ignore[assignment]
            elif node.op == "add":
                memo[id(node)] = memo[id(node.args[0])] + memo[id(node.args[1])]
            else:
                memo[id(node)] = memo[id(node.args[0])] * memo[id(node.args[1])]
        return memo[id(self)]

    def __repr__(self) -> str:
        return f"CtExpr(op={self.op}, chunks={self.chunks}, leaves={len(self.leaves())})"


def _postorder(root: CtExpr) -> list[CtExpr]:
    """Iterative post-order over the DAG, each node once (identity-deduped)."""
    out: list[CtExpr] = []
    visited: set[int] = set()
    stack: list[tuple[CtExpr, bool]] = [(root, False)]
    while stack:
        node, expanded = stack.pop()
        if id(node) in visited:
            continue
        if expanded or node.op == "leaf":
            visited.add(id(node))
            out.append(node)
        else:
            stack.append((node, True))
            for a in node.args:
                if id(a) not in visited:
                    stack.append((a, False))
    return out


def _map_leaves(root: CtExpr, fn) -> CtExpr:
    memo: dict[int, CtExpr] = {}
    for node in _postorder(root):
        if node.op == "leaf":
            new_ct = fn(node.ct)
            memo[id(node)] = CtExpr("leaf", new_ct, (), new_ct.chunks)
        else:
            args = tuple(memo[id(a)] for a in node.args)
            memo[id(node)] = CtExpr(node.op, None, args, node.chunks)
    return memo[id(root)]
