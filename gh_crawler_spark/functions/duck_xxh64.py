"""XXH64 as pure DuckDB SQL — the oracle-side identity of functions/hashing.py.

The driver's correctness gate runs each oracle as a plain SQL string against
its own DuckDB connection (pre-registered parquet views, no Python UDF
registration), so every hash-sketch operator was stuck at a rows-only check:
DuckDB has no xxhash64. This module closes that gap by emitting the public
XXH64 algorithm (xxhash spec, Yann Collet, github.com/Cyan4973/xxHash — the
same public BSD spec hashing.py implements) as DuckDB macros over HUGEINT
modular arithmetic:

  * 64-bit wrap-around multiply via 32-bit limb split (HUGEINT holds the
    ≤2^65 intermediate sums; a direct 64×64 product could overflow 2^127),
  * rotations as ``(x·2^r mod 2^64) + x//2^(64-r)`` (disjoint bit ranges, so
    ``+`` is ``|``),
  * byte access via ``hex(encode(s))`` nibble lookup (honest UTF-8 bytes —
    ``ascii()`` would give codepoints).

Two DuckDB 1.0 binder limits shape the API:
  * ``list_reduce`` inside a macro only binds with an explicit list CAST
    (untyped macro params fail lambda binding), and a lambda cannot
    reference an OUTER lambda's variable — the little-endian loads are
    therefore unrolled, not looped;
  * macro expansion depth is capped at 128, so the full hash cannot be one
    macro. :func:`xxh64_stages` emits the stripes/tails/avalanche phases as
    NESTED PROJECTIONS instead — each phase reads the previous phase's
    materialized column, which also stops the avalanche (which reads its
    input 3×2 times) from re-evaluating the whole tail chain per reference.

Exactness is pinned two ways: tests/test_hashing.py asserts this SQL equals
``hashing.xxhash64_bytes`` (itself asserted equal to Spark's ``xxhash64``)
over random byte strings, and every staged-hash oracle in queries.py is a
full rows+schema+value-hash compare against the Spark pipeline.
"""

from __future__ import annotations

_M64 = "18446744073709551616"
_P1 = "11400714785074694791::HUGEINT"
_P2 = "14029467366897019727::HUGEINT"
_P3 = "1609587929392839161::HUGEINT"
_P4 = "9650029242287828579::HUGEINT"
_P5 = "2870177450012600261::HUGEINT"


def _le(bs: str, start: str, cnt: int) -> str:
    """Unrolled little-endian load of ``cnt`` bytes as SQL text (macro-safe:
    no lambda, so it can sit inside an outer list_reduce lambda)."""
    return "(" + " + ".join(
        f"array_extract({bs}, ({start}+{j})::INT) * {1 << (8 * j)}::HUGEINT"
        for j in range(cnt)
    ) + ")"


# One CREATE MACRO block; prepend to any oracle SQL that hashes (idempotent —
# CREATE OR REPLACE — and scoped to the driver's connection).
XXH64_MACROS = f"""
CREATE OR REPLACE MACRO xx_bytes(s) AS (
  list_transform(range(1, octet_length(encode(s))+1),
    i -> (16*(strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i-1, 1))-1)
        +    (strpos('0123456789ABCDEF', substr(hex(encode(s)), 2*i,   1))-1))::HUGEINT)
);
CREATE OR REPLACE MACRO xx_mul(a, b) AS (
  ( (a%4294967296)*(b%4294967296)
    + ((((a//4294967296)*(b%4294967296) + (a%4294967296)*(b//4294967296)) % 4294967296) * 4294967296)
  ) % {_M64}
);
CREATE OR REPLACE MACRO xx_rot(x, r) AS (
  ((x * (1::HUGEINT << r)) % {_M64}) + (x // (1::HUGEINT << (64-r)))
);
CREATE OR REPLACE MACRO xx_round(acc, inp) AS (
  xx_mul(xx_rot((acc + xx_mul(inp, {_P2})) % {_M64}, 31), {_P1})
);
CREATE OR REPLACE MACRO xx_merge(h, v) AS (
  (xx_mul(xor(h, xx_round(0::HUGEINT, v)), {_P1}) + {_P4}) % {_M64}
);
CREATE OR REPLACE MACRO xx_stripe_fold(bs, n, seed) AS (
  list_reduce(
    ([[ (seed + {_P1} + {_P2}) % {_M64}, (seed + {_P2}) % {_M64}, seed % {_M64}, (seed + {_M64} - {_P1}) % {_M64} ]]
    || list_transform(range(0, n//32), t -> [t::HUGEINT]))::HUGEINT[][],
    (a, b) -> [
      xx_round(a[1], {_le('bs', '32*b[1]+1', 8)}),
      xx_round(a[2], {_le('bs', '32*b[1]+9', 8)}),
      xx_round(a[3], {_le('bs', '32*b[1]+17', 8)}),
      xx_round(a[4], {_le('bs', '32*b[1]+25', 8)})
    ]
  )
);
CREATE OR REPLACE MACRO xx_h_large(v) AS (
  xx_merge(xx_merge(xx_merge(xx_merge(
    (xx_rot(v[1],1) + xx_rot(v[2],7) + xx_rot(v[3],12) + xx_rot(v[4],18)) % {_M64},
    v[1]), v[2]), v[3]), v[4])
);
CREATE OR REPLACE MACRO xx_tail8(h, bs, idx0, n) AS (
  list_reduce(([h] || list_transform(range(0, (n - idx0)//8), t -> {_le('bs', 'idx0 + 8*t + 1', 8)}))::HUGEINT[],
    (a, b) -> (xx_mul(xx_rot(xor(a, xx_round(0::HUGEINT, b)), 27), {_P1}) + {_P4}) % {_M64})
);
CREATE OR REPLACE MACRO xx_tail4(h, bs, idx0, n) AS (
  CASE WHEN (n - idx0) >= 4
    THEN (xx_mul(xx_rot(xor(h, xx_mul({_le('bs', 'idx0+1', 4)}, {_P1})), 23), {_P2}) + {_P3}) % {_M64}
    ELSE h END
);
CREATE OR REPLACE MACRO xx_tail1(h, bs, idx0, n) AS (
  list_reduce(([h] || list_transform(range(idx0, n), j -> array_extract(bs, (j+1)::INT)))::HUGEINT[],
    (a, b) -> xx_mul(xx_rot(xor(a, xx_mul(b, {_P5})), 11), {_P1}))
);
CREATE OR REPLACE MACRO xx_av1(h) AS ( xx_mul(xor(h, h//8589934592), {_P2}) );
CREATE OR REPLACE MACRO xx_av2(h) AS ( xx_mul(xor(h, h//536870912), {_P3}) );
CREATE OR REPLACE MACRO xx_signed(h) AS (
  CASE WHEN h >= 9223372036854775808::HUGEINT THEN (h - {_M64})::BIGINT ELSE h::BIGINT END
);
"""

# Spark's default xxhash64 seed
SPARK_SEED = "42::HUGEINT"


def xxh64_stages(
    inner_sql: str,
    bytes_expr: str,
    out_col: str,
    keep: str,
    seed_expr: str = SPARK_SEED,
    signed: bool = True,
) -> str:
    """Emit a SELECT computing XXH64 of ``bytes_expr`` (a HUGEINT[] byte-list
    expression over ``inner_sql``'s columns) as ``out_col``, carrying the
    ``keep`` columns through. ``signed=True`` yields Spark's signed-64 BIGINT
    representation; ``signed=False`` yields the raw unsigned HUGEINT (needed
    when the value seeds a follow-up hash, as Spark's multi-column xxhash64
    chains: hash(col2, seed=hash(col1, 42))).

    Ten nested projections: byte list -> stripe fold -> h0 -> tail8 ->
    tail4 -> tail1 -> avalanche (3 stages) -> sign. Each phase references
    the previous phase's column exactly once, so nothing is re-evaluated and
    the binder's 128-deep macro-recursion cap is never approached.
    """
    fin = (
        f"xx_signed(xor(__a2, __a2//4294967296))" if signed
        else f"xor(__a2, __a2//4294967296)"
    )
    return f"""
SELECT {keep}, {fin} AS {out_col} FROM (
 SELECT {keep}, xx_av2(__a1) AS __a2 FROM (
  SELECT {keep}, xx_av1(__h3) AS __a1 FROM (
   SELECT {keep}, xx_tail1(__h2, __bs, __n - (CASE WHEN __n%8 >= 4 THEN __n%8 - 4 ELSE __n%8 END), __n) AS __h3 FROM (
    SELECT {keep}, __bs, __n, xx_tail4(__h1, __bs, __n - __n%8, __n) AS __h2 FROM (
     SELECT {keep}, __bs, __n, xx_tail8(__h0, __bs, __n - __n%32, __n) AS __h1 FROM (
      SELECT {keep}, __bs, __n,
             ((CASE WHEN __n >= 32 THEN xx_h_large(__vs) ELSE (__seed + {_P5}) % {_M64} END) + __n) % {_M64} AS __h0 FROM (
       SELECT {keep}, __bs, __n, __seed, CASE WHEN __n >= 32 THEN xx_stripe_fold(__bs, __n, __seed) ELSE NULL END AS __vs FROM (
        SELECT {keep}, {bytes_expr} AS __bs, len({bytes_expr}) AS __n, {seed_expr} AS __seed FROM ({inner_sql})
       )
      )
     )
    )
   )
  )
 )
)"""


def xxh64_str_stages(
    inner_sql: str, str_col: str, out_col: str, keep: str,
    seed_expr: str = SPARK_SEED, signed: bool = True,
) -> str:
    """XXH64 of a STRING column's UTF-8 bytes — Spark ``xxhash64(str_col)``
    when ``seed_expr`` is the default. The byte list is materialized once in
    the innermost projection (``xx_bytes`` re-reads ``hex(encode(s))`` per
    byte; staging it keeps that per-row, not per-phase)."""
    staged = xxh64_stages(
        f"SELECT {keep}, xx_bytes({str_col}) AS __sb FROM ({inner_sql})",
        "__sb", out_col, keep, seed_expr=seed_expr, signed=signed,
    )
    return staged


def xxh64_int_stages(
    inner_sql: str, int_value: int, out_col: str, keep: str,
    seed_expr: str, signed: bool = True,
) -> str:
    """XXH64 of a 4-byte little-endian INT — Spark's IntegerType hash path
    (XXH64.hashInt == the generic algorithm over the int's 4 LE bytes).
    Used for the chained second column of ``xxhash64(shingle, lit(1))``:
    ``seed_expr`` is the unsigned hash of the first column."""
    le4 = [(int_value >> (8 * j)) & 0xFF for j in range(4)]
    lst = "[" + ",".join(f"{b}::HUGEINT" for b in le4) + "]"
    return xxh64_stages(inner_sql, lst, out_col, keep, seed_expr=seed_expr, signed=signed)
