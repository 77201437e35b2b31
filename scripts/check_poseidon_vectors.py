#!/usr/bin/env python3
"""Independent re-derivation of the engine's Poseidon digests from the
published spec, checked against the VECTORS.md table.

graft.functions.Poseidon generates its round constants with the
Poseidon paper's Grain-LFSR procedure and its MDS matrix with the
Cauchy construction, then runs the standard t=3 / x^5 / R_F=8 / R_P=57
permutation. A transcription slip anywhere (LFSR taps, init-sequence
field widths, shrinking-generator order, rejection sampling, round
structure, MDS indices) would still be deterministic and field-closed —
exactly what the structural specs cannot catch. This script
re-implements the WHOLE derivation in Python directly from the paper's
description, sharing no code with the Scala side, and recomputes every
digest recorded in VECTORS.md.

Agreement means the Scala implementation faithfully implements the
declared parameterization; the remaining (documented) open question —
whether that parameterization matches circomlib's concrete instance —
still needs the online circomlibjs diff recorded in VECTORS.md.

Usage: python3 scripts/check_poseidon_vectors.py [path-to-VECTORS.md]
"""
import re
import sys

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
T, RF, RP, NBITS = 3, 8, 57, 254


class Grain:
    """80-bit LFSR, s[i+80] = s[i+62]+s[i+51]+s[i+38]+s[i+23]+s[i+13]+s[i];
    init = 2b field kind, 4b sbox, 12b n, 12b t, 10b R_F, 10b R_P, 30 ones;
    160 discarded warm-up bits; shrinking generator (first bit gates the
    second); field elements are NBITS MSB-first draws rejection-sampled < P."""

    def __init__(self):
        bits = []

        def append(value, width):
            for i in range(width - 1, -1, -1):
                bits.append((value >> i) & 1)

        append(1, 2)      # prime field
        append(0, 4)      # x^5 sbox
        append(NBITS, 12)
        append(T, 12)
        append(RF, 10)
        append(RP, 10)
        bits.extend([1] * 30)
        self.state = bits
        for _ in range(160):
            self._raw()

    def _raw(self):
        s = self.state
        bit = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(bit)
        return bit

    def bit(self):
        while True:
            b1, b2 = self._raw(), self._raw()
            if b1:
                return b2

    def field_element(self):
        while True:
            v = 0
            for _ in range(NBITS):
                v = (v << 1) | self.bit()
            if v < P:
                return v


def derive():
    g = Grain()
    rc = [g.field_element() for _ in range((RF + RP) * T)]
    mds = [[pow(i + T + j, P - 2, P) for j in range(T)] for i in range(T)]
    return rc, mds


def permute(state, rc, mds):
    c = 0
    half = RF // 2
    for r in range(RF + RP):
        s1 = [(state[i] + rc[c + i]) % P for i in range(T)]
        c += T
        full = r < half or r >= half + RP
        for i in range(T):
            if full or i == 0:
                x2 = s1[i] * s1[i] % P
                s1[i] = x2 * x2 % P * s1[i] % P
        state = [sum(mds[i][j] * s1[j] for j in range(T)) % P for i in range(T)]
    return state


def hash2(a, b, rc, mds):
    return permute([0, a % P, b % P], rc, mds)[0]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "VECTORS.md"
    val = lambda s: P - 1 if s == "p − 1" else int(s)
    rows2, rows3 = [], []
    for line in open(path):
        # exactly-3-column rows are hash2 vectors, 4-column rows hash3
        m2 = re.fullmatch(
            r"\|\s*(p − 1|\d+)\s*\|\s*(p − 1|\d+)\s*\|\s*(\d+)\s*\|\s*",
            line.rstrip("\n"))
        m3 = re.fullmatch(
            r"\|\s*(p − 1|\d+)\s*\|\s*(p − 1|\d+)\s*\|\s*(p − 1|\d+)\s*\|\s*(\d+)\s*\|\s*",
            line.rstrip("\n"))
        if m2:
            rows2.append((val(m2.group(1)), val(m2.group(2)), int(m2.group(3))))
        elif m3:
            rows3.append((val(m3.group(1)), val(m3.group(2)),
                          val(m3.group(3)), int(m3.group(4))))
    assert rows2, "no hash2 vector rows found in VECTORS.md"
    rc, mds = derive()
    for a, b, want in rows2:
        got = hash2(a, b, rc, mds)
        assert got == want, (
            f"MISMATCH hash2({a}, {b}): independent derivation {got} != recorded {want}"
        )
        print(f"PASS hash2({a}, {b}) == {str(want)[:24]}…")
    # hash3 = hash2(hash2(a, b), c) — the engine's declared composition
    for a, b, c, want in rows3:
        got = hash2(hash2(a, b, rc, mds), c, rc, mds)
        assert got == want, (
            f"MISMATCH hash3({a}, {b}, {c}): derivation {got} != recorded {want}"
        )
        print(f"PASS hash3({a}, {b}, {c}) == {str(want)[:24]}…")
    print(f"PASS all {len(rows2)} hash2 + {len(rows3)} hash3 digests "
          "re-derived independently")


if __name__ == "__main__":
    main()
