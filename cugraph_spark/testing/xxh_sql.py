"""DuckDB SQL codegen for Spark's ``xxhash64`` — exact cross-engine PRNG.

Every randomized operator in this engine draws its randomness from
``F.xxhash64(...)`` over row keys plus a literal seed (never ``F.rand``,
whose per-partition seeding makes results depend on physical layout).
That choice makes the operators *pure functions* of their inputs — and
therefore oracle-checkable: this module emits DuckDB SQL that reproduces
Spark's hash bit-for-bit, so rmat / random-walk / sampling queries get
exact DuckDB oracles instead of rows-only checks.

Spark's ``xxhash64(c1, .., cn)`` folds XXH64 one column at a time:
``h = 42; h = hash(c_i, h)`` where ``hash`` is the 8-byte (LongType) or
4-byte (IntegerType) XXH64 closed form (single round + avalanche; see
Spark's ``XXH64.hashLong/hashInt``).

DuckDB has no wrapping 64-bit arithmetic (BIGINT ops raise on overflow),
so values are carried as UBIGINT in [0, 2^64) and every multiply routes
through HUGEINT with the multiplicand split into 32-bit halves to keep
intermediates under 2^97 (INT128-safe). Each hash step becomes ONE named
column in a nested-subquery chain — naive expression nesting duplicates
subexpressions exponentially and must not be used.
"""

from __future__ import annotations

from typing import Sequence, Union

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 1 << 64


def _mul(x: str, c: int) -> str:
    """(x * c) mod 2^64, INT128-overflow-safe (split x into 32-bit halves)."""
    xl = f"(({x})::HUGEINT % 4294967296)"
    xh = f"(({x})::HUGEINT // 4294967296)"
    return (
        f"((({xl} * {c}::HUGEINT) + ((({xh} * {c}::HUGEINT) % 4294967296) * 4294967296))"
        f" % {_M64})::UBIGINT"
    )


def _rotl(x: str, n: int) -> str:
    return (
        f"(((({x})::HUGEINT * {1 << n}::HUGEINT) % {_M64})"
        f" + (({x}) // {1 << (64 - n)}))::UBIGINT"
    )


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)"


def _shr(x: str, n: int) -> str:
    return f"(({x}) // {1 << n})"


def _addc(x: str, c: int) -> str:
    return f"((({x})::HUGEINT + {c}::HUGEINT) % {_M64})::UBIGINT"


def to_u64(expr: str) -> str:
    """Signed BIGINT SQL expr -> its two's-complement value as UBIGINT."""
    return f"(((({expr})::HUGEINT % {_M64}) + {_M64}) % {_M64})::UBIGINT"


def to_i64(expr: str) -> str:
    """UBIGINT expr in [0, 2^64) -> signed BIGINT (two's complement)."""
    return (
        f"(CASE WHEN ({expr}) >= {1 << 63}"
        f" THEN (({expr})::HUGEINT - {_M64})::BIGINT ELSE ({expr})::BIGINT END)"
    )


def _hash_steps(prefix: str, val: str, seed: str, width: int) -> list[tuple[str, str]]:
    """XXH64 single-value round as (column_name, expr) steps.

    ``width`` 8 => Spark hashLong (input is a u64 expr); 4 => hashInt
    (input is a signed 32-bit expr, widened unsigned).
    """
    s = []
    if width == 8:
        # k1 = rotl(val*P2, 31)*P1 ; h2 = rotl((seed+P5+8) ^ k1, 27)*P1 + P4
        s.append((f"{prefix}_v", f"({val})"))
        s.append((f"{prefix}_k1", _mul(_rotl(_mul(f"{prefix}_v", _P2), 31), _P1)))
        s.append(
            (f"{prefix}_h2",
             _addc(_mul(_rotl(_xor(_addc(seed, _P5 + 8), f"{prefix}_k1"), 27), _P1), _P4))
        )
    elif width == 4:
        # h2 = rotl((seed+P5+4) ^ ((i & 0xFFFFFFFF)*P1), 23)*P2 + P3
        widened = f"(((({val})::HUGEINT % 4294967296) + 4294967296) % 4294967296)::UBIGINT"
        s.append((f"{prefix}_w", widened))
        s.append(
            (f"{prefix}_h2",
             _addc(_mul(_rotl(_xor(_addc(seed, _P5 + 4), _mul(f"{prefix}_w", _P1)), 23), _P2), _P3))
        )
    else:
        raise ValueError("width must be 4 or 8")
    # fmix avalanche, two steps to bound subexpression duplication
    s.append((f"{prefix}_f2", _mul(_xor(f"{prefix}_h2", _shr(f"{prefix}_h2", 33)), _P2)))
    s.append((f"{prefix}_f5",
              _xor(_mul(_xor(f"{prefix}_f2", _shr(f"{prefix}_f2", 29)), _P3),
                   _shr(_mul(_xor(f"{prefix}_f2", _shr(f"{prefix}_f2", 29)), _P3), 32))))
    return s


Col = tuple[str, Union[str, int]]  # (sql_expr, "long"|"int") or literal handled by caller


def hash_round_steps(
    prefix: str, val: str, seed: str, dtype: str
) -> tuple[list[tuple[str, str]], str]:
    """One Spark hash fold step ``h' = hash(val, h)`` continuing from an
    arbitrary seed expression (a column from earlier steps). Lets oracles
    share the common prefix of chained hashes (e.g. rmat hashes the same
    row id once, then folds a different per-level literal on top)."""
    if dtype == "long":
        steps = _hash_steps(prefix, to_u64(val), seed, 8)
    elif dtype == "int":
        steps = _hash_steps(prefix, f"({val})", seed, 4)
    else:
        raise ValueError(f"unsupported dtype {dtype!r}")
    return steps, f"{prefix}_f5"


def xxhash64_steps(
    prefix: str, cols: Sequence[tuple[str, str]], seed: int = 42
) -> tuple[list[tuple[str, str]], str]:
    """Steps computing Spark ``xxhash64(cols...)`` (seed 42).

    ``cols``: sequence of (sql_expr, dtype) with dtype "long" (BIGINT
    semantics) or "int" (IntegerType literal/column). Returns (steps,
    final_column_name); the final column holds the UNSIGNED u64 hash —
    wrap with :func:`to_i64` for Spark's signed value.
    """
    steps: list[tuple[str, str]] = []
    acc = f"{seed}::UBIGINT"
    for i, (expr, dtype) in enumerate(cols):
        p = f"{prefix}{i}"
        if dtype == "long":
            steps += _hash_steps(p, to_u64(expr), acc, 8)
        elif dtype == "int":
            steps += _hash_steps(p, f"({expr})", acc, 4)
        else:
            raise ValueError(f"unsupported dtype {dtype!r}")
        acc = f"{p}_f5"
    return steps, acc


def cte_chain(
    source: str, steps: Sequence[tuple[str, str]], prefix: str, batch: int = 4
) -> tuple[list[str], str]:
    """Turn ``steps`` into chained MATERIALIZED CTE definitions on top of
    CTE/table ``source``; returns (cte_defs, final_cte_name).

    Two DuckDB limits shape this: the binder rewrites lateral column
    aliases into nested projections and refuses chains deeper than 128,
    so each CTE carries only ``batch`` step columns; and non-materialized
    CTEs are inlined (re-nesting everything), so every link is AS
    MATERIALIZED. Steps may reference any column from earlier steps or
    the source."""
    defs: list[str] = []
    cur = source
    for i in range(0, len(steps), batch):
        chunk = steps[i : i + batch]
        name = f"{prefix}{i // batch}"
        cols = ", ".join(f"{expr} AS {n}" for n, expr in chunk)
        defs.append(f"{name} AS MATERIALIZED (SELECT *, {cols} FROM {cur})")
        cur = name
    return defs, cur


def fold_steps(
    base_sql: str, steps: Sequence[tuple[str, str]], final_select: str = "*",
    batch: int = 4, cte_prefix: str = "xxh",
) -> str:
    """Apply ``steps`` on top of ``base_sql``; see :func:`cte_chain`."""
    defs, last = cte_chain(f"{cte_prefix}_base", steps, cte_prefix, batch)
    parts = [f"{cte_prefix}_base AS MATERIALIZED ({base_sql})"] + defs
    return f"WITH {', '.join(parts)} SELECT {final_select} FROM {last}"


def pmod_sql(expr: str, m: int) -> str:
    """Spark F.pmod for signed BIGINT expr."""
    return f"((({expr}) % {m}) + {m}) % {m}"
