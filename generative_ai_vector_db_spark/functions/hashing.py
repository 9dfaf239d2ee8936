"""Engine-portable deterministic integer hashing.

Several operators (q132 weighted sampling, q184 epoch shuffle, q187
bucket-layout planning) need a uniform-ish deterministic hash of a
64-bit id that BOTH Spark and DuckDB compute bit-identically — Spark's
`hash()` is Murmur3 (not reproducible in DuckDB SQL) and DuckDB's
`hash()` is its own — so the repo uses an explicit multiplicative mix
written in portable integer SQL.

Round-5 advice flagged two defects in the previous single-multiply
form `((id % M) * K) % B`:

1. The Knuth multiplier K = 2654435761 is ``K ≡ 1 (mod 16)``, so for a
   power-of-two bucket count B the multiply was a NO-OP on the low bits
   (bucket == id % M % B) — the q187 planner was measuring round-robin
   residues, not a hashed layout.
2. Reducing the id to ``id % M`` BEFORE the only multiply makes
   ``id`` and ``id + M`` collide exactly, so every ~1M-apart pair of
   documents got identical sample keys / shuffle positions in every
   epoch — systematic correlation at precisely the >1M-id scale the
   guard targets.

The fix (this module): a TWO-LANE mix that folds the high part of the
id back in with a second odd constant, then reduces once modulo the
Mersenne prime 2^31-1 so the low bits of the result depend on ALL the
input bits:

    core(id) = (id % M) * K1  +  ((id div M) % M) * K2
    mix(id)  = core(id) % HASH_MOD          -- in [0, HASH_MOD)

Overflow safety (the reason M exists at all): each lane's product is
< M * K ~ 2.66e15, the sum < 5.4e15, and call sites may add small
salts (epoch * salt + constants < 1e7) — total < 2^63 / 1700, so the
arithmetic never wraps int64 in Spark nor raises in DuckDB for ANY
int64 id.  Collision period rises from M (= 1e6) to M^2 (= 1e12):
ids within any realistic corpus never alias.

Why `% HASH_MOD` before any power-of-two bucketing: HASH_MOD is an odd
prime, so the reduction redistributes the product's high bits into the
low bits — `mix(id) % 16` genuinely depends on the multipliers (the
round-5 no-op is structurally impossible regardless of K1 % 16).

Both fragments are plain integer SQL; the only dialect difference is
integer division (`div` in Spark SQL, `//` in DuckDB).
"""

from __future__ import annotations

PORTABLE_ID_MOD = 1_000_003  # prime; splits the id into two lanes
KNUTH1 = 2654435761  # Knuth's 2^32 / phi multiplier (low lane)
KNUTH2 = 2246822519  # xxhash PRIME32_2 (high lane — odd, independent)
HASH_MOD = 2147483647  # Mersenne prime 2^31 - 1


def mix_core_spark(expr: str) -> str:
    """Unreduced two-lane mix as a Spark SQL fragment (fits int64).

    Call sites add their own small salt then reduce `% HASH_MOD`.
    """
    m, k1, k2 = PORTABLE_ID_MOD, KNUTH1, KNUTH2
    return (
        f"(({expr}) % {m}) * {k1} + "
        f"((({expr}) div {m}) % {m}) * {k2}"
    )


def mix_core_duck(expr: str) -> str:
    """Identical mix as a DuckDB SQL fragment (`//` integer division)."""
    m, k1, k2 = PORTABLE_ID_MOD, KNUTH1, KNUTH2
    return (
        f"(({expr}) % {m}) * {k1} + "
        f"((({expr}) // {m}) % {m}) * {k2}"
    )


def mix_spark(expr: str) -> str:
    """Fully-reduced mix in [0, HASH_MOD) — Spark SQL fragment."""
    return f"(({mix_core_spark(expr)}) % {HASH_MOD})"


def mix_duck(expr: str) -> str:
    """Fully-reduced mix in [0, HASH_MOD) — DuckDB SQL fragment."""
    return f"(({mix_core_duck(expr)}) % {HASH_MOD})"


# ---------------------------------------------------------------------------
# Avalanche finalizer (round 11): the two-lane mix above is UNIFORM in
# residue statistics (bucket assignment, sampling keys) but it is a
# LINEAR map, so its outputs over sequential ids form a lattice — the
# leading-zero-count statistic HyperLogLog depends on is badly biased
# (measured +81% cardinality error on sequential custkeys at m=64).
# Three xor-shift-multiply rounds break the linearity (measured max
# |rel err| 5% at m=256 across all nine id-domain x scale-factor
# combinations, within the 6.5% HLL standard error). Everything stays
# in [0, 2^31): xor/shift of non-negative int64 is portable, each
# product < 2^31 * 2^32 < 2^63, and `%` reduces back below 2^31 —
# identical arithmetic in Spark SQL and DuckDB.
# Spark `^`/shiftright() vs DuckDB xor()/`>>` is pure dialect.
# ---------------------------------------------------------------------------
AVA_SHIFTS = (15, 13, 17)
AVA_MULTS = (KNUTH2, KNUTH1, 40503)  # 40503 = Knuth's 16-bit phi constant


# Each round reads its input twice (h and h >> s). A naive textual
# substitution therefore doubles the accumulated expression per round
# — 16 inlined mix copies per call, ~90 KB of SQL at q337's 18-shard
# call site. Both dialects support lambda binding through a 1-element
# list/array transform, so each stage binds its input ONCE and the
# fragment stays linear in the round count.


def _rounds_nested(mk_round, mk_final, wrap) -> str:
    """Shared nesting: wrap(v0=mix, v1=round(v0), ..., final(v3))."""
    body = mk_final("h3")
    for i, (s, k) in reversed(list(enumerate(zip(AVA_SHIFTS, AVA_MULTS)))):
        body = wrap(mk_round(f"h{i}", s, k), f"h{i + 1}", body)
    return body


def avalanche_spark(expr: str) -> str:
    """Non-linear portable hash in [0, 2^31) — Spark SQL fragment.

    Deliberately INLINE (textually duplicated per round) unlike the
    DuckDB twin below: whole-stage codegen's subexpression elimination
    absorbs the duplication at runtime, while the lambda-bound
    transform(array(x), h -> ...) form allocates an array per row and
    defeats codegen — measured 4x slower per hash eval on the sf0.1
    lineitem scan (0.15 s vs 0.57 s). The two dialect FORMS may differ
    freely — only the computed values must match.
    """
    h = mix_spark(expr)
    for s, k in zip(AVA_SHIFTS, AVA_MULTS):
        h = f"(((({h}) ^ shiftright(({h}), {s})) * {k}) % {HASH_MOD})"
    return f"(({h}) ^ shiftright(({h}), 16))"


def avalanche_duck(expr: str) -> str:
    """Identical finalizer — DuckDB SQL fragment."""
    body = _rounds_nested(
        lambda v, s, k: f"((xor(({v}), ({v}) >> {s})) * {k}) % {HASH_MOD}",
        lambda v: f"xor(({v}), ({v}) >> 16)",
        lambda val, var, inner: f"list_transform([{val}],"
        f" {var} -> {inner})[1]",
    )
    return f"list_transform([{mix_duck(expr)}], h0 -> {body})[1]"
