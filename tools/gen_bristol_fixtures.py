"""Generate the committed Bristol-Fashion fixture files in tests/circuits/.

The published benchmark suite (adder64 / comparators / AES, the files the
MPC ecosystem ships) cannot be fetched in this environment (no egress), so
these fixtures are authored HERE in the exact published *format*, exercising
the conventions the published files use and our in-library generators
(`models.netlist.adder` etc.) deliberately avoid:

  * a blank separator line between the 3 header lines and the gates,
  * outputs living on the LAST wires with gates listed in topological order
    but output-wire numbers JUMPING ahead of the internal numbering (the
    published adder64 does this; our `_Builder.finish` instead appends EQW
    copies so its wire numbers are strictly sequential),
  * INV gates (not expanded to XOR-with-1),
  * for the MAND fixture: the EXTENDED Bristol-Fashion multi-output MAND
    line ("4 2 in in in in out out MAND"), which CSGN must reject loudly.

Value bit order is little-endian (wire i of a value = bit i, LSB first),
matching the published arithmetic circuits.  Run from the repo root:
    python tools/gen_bristol_fixtures.py
"""

from __future__ import annotations

import pathlib

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "circuits"


class Emitter:
    """Wire allocator that places declared outputs on the final wire block."""

    def __init__(self, n_inputs: int, n_internal: int, n_outputs: int):
        self.next_internal = n_inputs
        self.first_out = n_inputs + n_internal
        self.next_out = self.first_out
        self.n_wires = n_inputs + n_internal + n_outputs
        self.lines: list[str] = []

    def gate(self, op: str, ins: list[int], *, out_wire: bool = False) -> int:
        if out_wire:
            w = self.next_out
            self.next_out += 1
        else:
            w = self.next_internal
            self.next_internal += 1
        self.lines.append(f"{len(ins)} 1 {' '.join(map(str, ins))} {w} {op}")
        return w

    def text(self, input_sizes: list[int], output_sizes: list[int]) -> str:
        assert self.next_internal == self.first_out, "internal wire count mismatch"
        assert self.next_out == self.n_wires, "output wire count mismatch"
        hdr = [
            f"{len(self.lines)} {self.n_wires}",
            f"{len(input_sizes)} {' '.join(map(str, input_sizes))}",
            f"{len(output_sizes)} {' '.join(map(str, output_sizes))}",
            "",  # the published files separate header and gates with a blank line
        ]
        return "\n".join(hdr + self.lines) + "\n"


def adder64() -> str:
    """64-bit ripple-carry adder mod 2^64: two 64-bit inputs -> 64-bit sum.

    Same interface as the published adder64 (2 inputs of 64, 1 output of 64,
    little-endian); the gate list is an independently authored ripple-carry
    (the published file is a carry-select variant)."""
    w = 64
    # internal gates: bit0 AND; bits 1..62: XOR,AND,AND,XOR (4 each); bit63: XOR
    n_internal = 1 + 62 * 4 + 1
    e = Emitter(2 * w, n_internal, w)
    a = list(range(w))
    b = list(range(w, 2 * w))
    carry = None
    for i in range(w):
        if i == 0:
            e.gate("XOR", [a[0], b[0]], out_wire=True)          # s0
            carry = e.gate("AND", [a[0], b[0]])
        elif i < w - 1:
            axb = e.gate("XOR", [a[i], b[i]])
            e.gate("XOR", [axb, carry], out_wire=True)           # s_i
            aab = e.gate("AND", [a[i], b[i]])
            t = e.gate("AND", [carry, axb])
            carry = e.gate("XOR", [aab, t])
        else:
            axb = e.gate("XOR", [a[i], b[i]])
            e.gate("XOR", [axb, carry], out_wire=True)           # s63, no c_out
    return e.text([w, w], [w])


def gt32() -> str:
    """Unsigned 32-bit greater-than: two 32-bit inputs -> 1 bit (a > b).

    LSB-up recurrence gt_i = (a_i & ~b_i) | (eq_i & gt_{i-1}), OR expanded
    into the {XOR, AND} basis; uses INV gates as the published comparator
    circuits do."""
    w = 32
    # bit0: INV, AND(out if w==1) -> 2; bits 1..30: INV,AND,XOR,INV,AND,AND,XOR,XOR (8)
    # bit31: same 8 but final XOR is the output wire.
    n_internal = 2 + 30 * 8 + 7
    e = Emitter(2 * w, n_internal, 1)
    a = list(range(w))
    b = list(range(w, 2 * w))
    gt = None
    for i in range(w):
        nb = e.gate("INV", [b[i]])
        a_nb = e.gate("AND", [a[i], nb])
        if gt is None:
            gt = a_nb
            continue
        x = e.gate("XOR", [a[i], b[i]])
        eq = e.gate("INV", [x])
        t = e.gate("AND", [eq, gt])
        u = e.gate("AND", [a_nb, t])
        v = e.gate("XOR", [a_nb, t])
        gt = e.gate("XOR", [v, u], out_wire=(i == w - 1))
    return e.text([w, w], [1])


def aes_sbox() -> str:
    """AES-128 S-box: one 8-bit input -> one 8-bit output (little-endian).

    Built algebraically — GF(2^8) inversion as x^254 (4 multiplications +
    7 squarings, field reduction mod x^8+x^4+x^3+x+1) followed by the
    standard affine map with constant 0x63 — NOT the Boyar-Peralta
    gate-minimized published file, but the same interface/class; the test
    verifies all 256 plain evaluations against an independently constructed
    log/antilog S-box table, plus the spec anchors S(0x00)=0x63,
    S(0x01)=0x7C, S(0x53)=0xED (FIPS-197 worked example).  inv(0)=0 falls
    out of x^254 automatically.
    """
    gates: list[tuple] = []  # (op, ins..., placeholder) resolved at emit
    next_wire = [8]

    def emit(op: str, *ins: int) -> int:
        w = next_wire[0]
        next_wire[0] += 1
        gates.append((op, ins, w))
        return w

    def xor_tree(ws: list[int]) -> int:
        assert ws
        acc = ws[0]
        for w in ws[1:]:
            acc = emit("XOR", acc, w)
        return acc

    def reduce15(coeffs: list[list[int]]) -> list[list[int]]:
        """Reduce 15 coefficient wire-lists mod x^8 + x^4 + x^3 + x + 1."""
        c = [list(ws) for ws in coeffs]
        for k in range(14, 7, -1):
            for tgt in (k - 4, k - 5, k - 7, k - 8):
                c[tgt].extend(c[k])
            c[k] = []
        return c[:8]

    def gf_mul(a: list[int], b: list[int]) -> list[int]:
        prods: list[list[int]] = [[] for _ in range(15)]
        for i in range(8):
            for j in range(8):
                prods[i + j].append(emit("AND", a[i], b[j]))
        return [xor_tree(ws) for ws in reduce15(prods)]

    def gf_sq(a: list[int]) -> list[int]:
        coeffs: list[list[int]] = [[] for _ in range(15)]
        for i in range(8):
            coeffs[2 * i].append(a[i])
        # pure rewiring + XOR trees (squaring is linear over GF(2))
        return [xor_tree(ws) if ws else [emit("EQ", 0)][0]
                for ws in reduce15(coeffs)]

    x = list(range(8))
    t2 = gf_sq(x)                       # x^2
    t3 = gf_mul(t2, x)                  # x^3
    t12 = gf_sq(gf_sq(t3))              # x^12
    t15 = gf_mul(t12, t3)               # x^15
    t240 = gf_sq(gf_sq(gf_sq(gf_sq(t15))))  # x^240
    t252 = gf_mul(t240, t12)            # x^252
    inv = gf_mul(t252, t2)              # x^254 = x^-1 (and 0 -> 0)

    # Affine: b_i = a_i ^ a_{i+4} ^ a_{i+5} ^ a_{i+6} ^ a_{i+7} ^ c_i, c=0x63
    out_bits = []
    for i in range(8):
        w = xor_tree([inv[i], inv[(i + 4) % 8], inv[(i + 5) % 8],
                      inv[(i + 6) % 8], inv[(i + 7) % 8]])
        if (0x63 >> i) & 1:
            w = emit("INV", w)
        out_bits.append(w)

    # Renumber so the 8 output bits land on the final wires (EQW copies keep
    # the generator simple; the adder64/gt32 fixtures cover jumped numbering).
    for i, w in enumerate(out_bits):
        gates.append(("EQW", (w,), next_wire[0] + i))
    n_wires = next_wire[0] + 8
    lines = [f"{len(gates)} {n_wires}", "1 8", "1 8", ""]
    for op, ins, w in gates:
        lines.append(f"{len(ins)} 1 {' '.join(map(str, ins))} {w} {op}")
    return "\n".join(lines) + "\n"


def mand3() -> str:
    """Extended-format fixture: a multi-output MAND line ("two ANDs in one
    gate"), which the CSGN parser must reject loudly, plus an EQ constant."""
    return (
        "3 9\n"
        "2 2 2\n"
        "1 3\n"
        "\n"
        "4 2 0 1 2 3 6 7 MAND\n"
        "2 1 0 2 8 XOR\n"
        "1 1 1 5 EQ\n"
    )


def main() -> None:
    OUT.mkdir(exist_ok=True)
    (OUT / "adder64.txt").write_text(adder64())
    (OUT / "gt32.txt").write_text(gt32())
    (OUT / "aes_sbox.txt").write_text(aes_sbox())
    (OUT / "mand3.txt").write_text(mand3())
    for f in ("adder64.txt", "gt32.txt", "aes_sbox.txt", "mand3.txt"):
        n = (OUT / f).read_text().count("\n")
        print(f"wrote tests/circuits/{f} ({n} lines)")


if __name__ == "__main__":
    main()
