#!/usr/bin/env python3
"""Independent cross-check of the BN254 Groth16 pairing vector in VECTORS.md.

The engine's Scala side (graft.functions.BN254) implements the REDUCED
TATE pairing over a nested Fq2/Fq6/Fq12 tower with tower-formula
inversions. This script implements the OPTIMAL ATE pairing over a flat
degree-12 polynomial extension (Fq[w]/(w^12 - 18 w^6 + 82)) with
extended-Euclid polynomial inversion — a structurally disjoint
implementation in a different language, sharing no code, no tower
shape, no Miller loop, and no inversion algorithm with the Scala side.

The design claim it checks (BN254.scala scaladoc): any two
non-degenerate bilinear pairings on the same (G1, G2) differ by a fixed
exponent coprime to r, so a product-of-pairings predicate holds under
the Tate form iff it holds under the ate form. Concretely: the
768-byte blob recorded in VECTORS.md was minted by the Scala TATE side
as a passing Groth16 check; the ATE product computed here must ALSO be
exactly 1 — and stays 1/not-1 in agreement under tampering.

Usage: python3 scripts/check_pairing_vector.py [path-to-VECTORS.md]
Exits 0 and prints PASS lines when every check agrees.

Pure stdlib; ~10 s (pure-Python big-int pairing, 4 Miller loops + final
exponentiations).
"""
import hashlib
import re
import sys

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ATE_LOOP = 29793968203157093288  # 6t + 2 for the BN254 parameter t

# ---------------------------------------------------------------------------
# Fq12 as polynomials over Fq modulo w^12 - 18 w^6 + 82
# (w^6 = xi = 9 + u with u^2 = -1  =>  (w^6 - 9)^2 = -1).
# ---------------------------------------------------------------------------
MOD = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0, 1]  # low -> high


def poly_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % Q
    return out


def poly_mod(a):
    a = a[:]
    while len(a) > 12:
        if a[-1]:
            top = a.pop()
            for i, c in enumerate(MOD[:-1]):
                a[len(a) - 12 + i] = (a[len(a) - 12 + i] - top * c) % Q
        else:
            a.pop()
    return a + [0] * (12 - len(a))


def f12_mul(a, b):
    return poly_mod(poly_mul(a, b))


def f12_sub(a, b):
    return [(x - y) % Q for x, y in zip(a, b)]


ONE = [1] + [0] * 11
ZERO = [0] * 12


def poly_degree(p):
    for i in range(len(p) - 1, -1, -1):
        if p[i]:
            return i
    return -1


def f12_inv(a):
    # extended Euclid over Fq[x]: invert a modulo the degree-12 poly
    lm, hm = [1] + [0] * 12, [0] * 13
    low, high = a[:12] + [0], [c % Q for c in MOD]
    while poly_degree(low) > 0:
        r = poly_rdiv(high, low)
        nm, new = hm[:], high[:]
        for i in range(13):
            for j in range(13 - i):
                if i + j < 13:
                    nm[i + j] = (nm[i + j] - lm[i] * r[j]) % Q
                    new[i + j] = (new[i + j] - low[i] * r[j]) % Q
        lm, low, hm, high = nm, new, lm, low
    inv0 = pow(low[0], Q - 2, Q)
    return [(c * inv0) % Q for c in lm[:12]]


def poly_rdiv(a, b):
    # polynomial division a // b over Fq, degree(b) <= degree(a) <= 12
    da, db = poly_degree(a), poly_degree(b)
    temp, out = a[:], [0] * 13
    invb = pow(b[db], Q - 2, Q)
    for i in range(da - db, -1, -1):
        c = (temp[db + i] * invb) % Q
        out[i] = c
        for j in range(db + 1):
            temp[i + j] = (temp[i + j] - c * b[j]) % Q
    return out


def f12_pow(a, e):
    out = ONE[:]
    base = a[:]
    while e:
        if e & 1:
            out = f12_mul(out, base)
        base = f12_mul(base, base)
        e >>= 1
    return out


def f12_scalar(s):
    return [s % Q] + [0] * 11


# FQ2 element (a, b) = a + b*u, u = w^6 - 9  =>  embeds as (a - 9b) + b*w^6
def embed_fq2(a, b):
    out = [0] * 12
    out[0] = (a - 9 * b) % Q
    out[6] = b % Q
    return out


# ---------------------------------------------------------------------------
# Curve arithmetic over Fq12 points (affine; None = infinity).
# ---------------------------------------------------------------------------


def pt_double(pt):
    if pt is None:
        return None
    x, y = pt
    if y == ZERO:
        return None
    l = f12_mul(f12_mul(f12_scalar(3), f12_mul(x, x)), f12_inv(f12_mul(f12_scalar(2), y)))
    nx = f12_sub(f12_sub(f12_mul(l, l), x), x)
    ny = f12_sub(f12_mul(l, f12_sub(x, nx)), y)
    return (nx, ny)


def pt_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2:
        if y1 == y2:
            return pt_double(p1)
        return None
    l = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    nx = f12_sub(f12_sub(f12_mul(l, l), x1), x2)
    ny = f12_sub(f12_mul(l, f12_sub(x1, nx)), y1)
    return (nx, ny)


def pt_mul(pt, n):
    out = None
    while n:
        if n & 1:
            out = pt_add(out, pt)
        pt = pt_double(pt)
        n >>= 1
    return out


def pt_neg(pt):
    if pt is None:
        return None
    x, y = pt
    return (x, [(-c) % Q for c in y])


def on_curve(pt):
    if pt is None:
        return True
    x, y = pt
    return f12_sub(f12_mul(y, y), f12_mul(x, f12_mul(x, x))) == f12_scalar(3)


# ---------------------------------------------------------------------------
# Optimal ate pairing (py_ecc-style structure, independently written).
# ---------------------------------------------------------------------------


def linefunc(p1, p2, t):
    (x1, y1), (x2, y2), (xt, yt) = p1, p2, t
    if x1 != x2:
        m = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    if y1 == y2:
        m = f12_mul(f12_mul(f12_scalar(3), f12_mul(x1, x1)), f12_inv(f12_mul(f12_scalar(2), y1)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    return f12_sub(xt, x1)


def frobenius_pt(pt):
    # (x, y) -> (x^q, y^q) computed directly in Fq12
    x, y = pt
    return (f12_pow(x, Q), f12_pow(y, Q))


def miller_ate(Qp, Pp):
    # f_{6t+2, Q}(P) with the two Frobenius correction lines
    rpt = Qp
    f = ONE[:]
    for i in range(ATE_LOOP.bit_length() - 2, -1, -1):
        f = f12_mul(f12_mul(f, f), linefunc(rpt, rpt, Pp))
        rpt = pt_double(rpt)
        if ATE_LOOP & (1 << i):
            f = f12_mul(f, linefunc(rpt, Qp, Pp))
            rpt = pt_add(rpt, Qp)
    q1 = frobenius_pt(Qp)
    nq2 = pt_neg(frobenius_pt(q1))
    f = f12_mul(f, linefunc(rpt, q1, Pp))
    rpt = pt_add(rpt, q1)
    f = f12_mul(f, linefunc(rpt, nq2, Pp))
    return f


def final_exp(f):
    return f12_pow(f, (Q ** 12 - 1) // R)


def ate_product(pairs):
    acc = ONE[:]
    for g1, g2 in pairs:
        acc = f12_mul(acc, miller_ate(g2, g1))
    return final_exp(acc)


# ---------------------------------------------------------------------------
# Blob parsing (4 x 192-byte pairs: G1 x||y, G2 x_im||x_re||y_im||y_re).
# ---------------------------------------------------------------------------


def parse_blob(blob):
    pairs = []
    for i in range(4):
        o = i * 192
        g1x = int.from_bytes(blob[o : o + 32], "big")
        g1y = int.from_bytes(blob[o + 32 : o + 64], "big")
        xb = int.from_bytes(blob[o + 64 : o + 96], "big")  # imaginary first
        xa = int.from_bytes(blob[o + 96 : o + 128], "big")
        yb = int.from_bytes(blob[o + 128 : o + 160], "big")
        ya = int.from_bytes(blob[o + 160 : o + 192], "big")
        g1 = (f12_scalar(g1x), f12_scalar(g1y))
        # untwist via w-multiplication: x * w^2, y * w^3
        w = [0, 1] + [0] * 10
        w2, w3 = f12_mul(w, w), f12_mul(f12_mul(w, w), w)
        g2 = (f12_mul(embed_fq2(xa, xb), w2), f12_mul(embed_fq2(ya, yb), w3))
        pairs.append((g1, g2))
    return pairs


# sha256 of the blob as pinned by BN254Spec ("the VECTORS.md cross-engine
# vector must match what the encoder emits") — re-pinned here so the parse
# below can never silently check the wrong bytes: if VECTORS.md grows
# another 64-hex-line block, a positional extraction would pick it up,
# pass or fail against the wrong data, and nobody would know.
PINNED_SHA256 = "b9ec0223d7ef0d1ab47273e3afca1876bfd359aaae01506b67be2caf09736f6c"

HEADING = "# BN254 Groth16 cross-engine pairing vector"


def extract_blob(path):
    """The 24 x 64-hex-char lines of the pairing-vector section, anchored
    to its heading (not position in the file) and digest-verified against
    the BN254Spec pin before any math runs on them."""
    lines = open(path).read().splitlines()
    # fence-aware like the section-end scan below: a quoted heading
    # inside a ``` example block must not count as a section start
    starts, fenced = [], False
    for i, l in enumerate(lines):
        if l.strip().startswith("```"):
            fenced = not fenced
        elif not fenced and l.startswith(HEADING):
            starts.append(i)
    assert len(starts) == 1, f"expected exactly one '{HEADING}' section, got {len(starts)}"
    # the section runs to the next top-level heading (or EOF); a "# …"
    # line inside a ``` code fence is a shell comment, not a heading
    section, fenced = [], False
    for l in lines[starts[0] + 1 :]:
        if l.strip().startswith("```"):
            fenced = not fenced
        elif not fenced and l.startswith("# "):
            break
        section.append(l.strip())
    hexlines = [l for l in section if re.fullmatch(r"[0-9a-f]{64}", l)]
    assert len(hexlines) == 24, (
        f"pairing-vector section holds {len(hexlines)} 64-hex lines, expected 24 "
        "— the section was edited; re-pin the vector or fix the parse"
    )
    blob = bytes.fromhex("".join(hexlines))
    got = hashlib.sha256(blob).hexdigest()
    assert got == PINNED_SHA256, (
        f"sha256(blob) = {got} != BN254Spec pin {PINNED_SHA256} — "
        "VECTORS.md drifted from what the encoder emits"
    )
    return blob


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "VECTORS.md"
    blob = extract_blob(path)
    assert len(blob) == 768, f"expected 768-byte blob, got {len(blob)}"

    # self-check the independent implementation before judging the blob
    g1 = (f12_scalar(1), f12_scalar(2))
    assert on_curve(g1), "G1 generator not on curve"
    assert pt_mul(g1, R) is None, "G1 generator order != r"
    pairs = parse_blob(blob)
    for i, (p, q) in enumerate(pairs):
        assert on_curve(p), f"pair {i}: G1 point off-curve"
        assert on_curve(q), f"pair {i}: untwisted G2 point off-curve"
        assert pt_mul(q, R) is None, f"pair {i}: G2 point not in r-torsion"
    print("PASS structure: 4 pairs on-curve, G2 in subgroup")

    # bilinearity self-check of THIS implementation (small scalars)
    qpt = pairs[0][1]
    e1 = final_exp(miller_ate(qpt, pt_mul(g1, 3)))
    e2 = f12_pow(final_exp(miller_ate(qpt, g1)), 3)
    assert e1 == e2, "independent ate implementation fails bilinearity"
    print("PASS self-check: ate implementation is bilinear")

    # THE cross-engine check: the Tate-minted Groth16 blob must
    # ate-product to exactly 1
    assert ate_product(pairs) == ONE, (
        "cross-engine FAIL: ate product of the recorded blob is not 1"
    )
    print("PASS cross-engine: ate product of the VECTORS.md blob == 1")

    # tamper agreement: negating one G1 point must break the product
    bad = [(pt_neg(pairs[0][0]), pairs[0][1])] + pairs[1:]
    assert ate_product(bad) != ONE, "tampered blob still checks to 1"
    print("PASS tamper: negated-A blob product != 1")


if __name__ == "__main__":
    main()
