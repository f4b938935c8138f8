"""Fixed-op-sequence IEEE-double ln/exp — the libm-free freeze.

Why this module exists: round 7 froze every engine-side ``ln`` to
driver-computed CPython values (``hostmath.py``) on the premise that
CPython's libm and DuckDB's libm are the same host library.  The
round-8 driver falsified that premise: ``docs_ngram_lm_score`` and
``docs_ccnet_buckets`` pass the LOCAL DuckDB 1.0.0 oracle bit-exactly
but stayed red on the driver, whose DuckDB build resolves ``ln``
differently in the last ulp.  Any oracle SQL that calls a
transcendental is therefore environment-dependent — the bug class
survives as long as EITHER side calls a libm.

The fix: compute ln (and exp) as ONE FIXED SEQUENCE of IEEE-754
double operations — comparisons, +, -, *, / and exact power-of-two
scaling only.  Every one of those operations is *exactly specified*
by IEEE 754 (correctly rounded, no implementation latitude), so any
engine that executes the same sequence on the same input produces the
same bits: CPython floats, Spark/JVM doubles (strict FP since Java
17), and DuckDB's vectorized double ops (each SQL operator is a
separate vectorized kernel, so there is no cross-operator FMA
contraction).  The sequence is defined ONCE below as a step table
with a Python lambda and a SQL template side by side per step;
``fxln``/``fxexp`` run the lambdas, ``ladder_sql`` emits the SQL —
drift between the two is caught by the cross-engine bit-equality
sweep in ``tests/test_fixedlog.py`` (CPython vs DuckDB vs Spark over
the full count domain).

Numerical shape (textbook, e.g. Cody & Waite):

* ``ln``: normalize x = m·2^e with m ∈ [√2/2, √2) via exact
  power-of-two comparisons/divisions, then atanh series
  ln(m) = 2t·(1 + t²/3 + … + t¹⁰/21), t = (m−1)/(m+1), |t| ≤ 0.1716
  (truncation < 3e-17 relative), then ln(x) = ln(m) + e·ln2.
* ``exp``: k = floor(x/ln2 + ½), r = x − k·ln2 ∈ [−0.35, 0.35],
  Taylor to r¹⁴/14! (truncation < 5e-18), scale by 2^k via exact
  power-of-two multiplies.

Accuracy vs the true function is ~1e-16 relative — but accuracy is
NOT the point; bit-identical evaluation everywhere is.  The frozen
micro-unit scores built on these differ from libm-based ones by at
most 1 micro-unit and are reproducible on any engine by construction.

Domains (asserted in Python, oracle args satisfy them by
construction): ``fxln`` x ∈ [2^-64, 2^64); ``fxexp`` |x| < 43.6
(result spans [2^-63, 2^63], covered by the 6-level scale cascade).

Reference parity note: feeds the same frozen-lookup discipline as
``hostmath.py`` (see scanner/DGIS_SCAN_2_stable.py provenance notes
there); this module is pure public numerics.
"""
from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP

# Shared double constants: computed in Python, emitted into SQL via
# repr() (shortest round-trip string -> identical double on any
# correctly-rounded parser, which DuckDB/Spark/CPython all are).
_TWO64 = 18446744073709551616.0          # 2^64, exact
_SQRT2 = 1.4142135623730951              # nearest double to sqrt(2)
_LN2 = 0.6931471805599453                # nearest double to ln(2)
_INV_LN2 = 1.4426950408889634            # nearest double to 1/ln(2)

# atanh-series coefficients 1/(2k+1), k = 10..1 (Horner order), each
# a single correctly-rounded division -> same double everywhere.
_LN_COEFFS = [1.0 / n for n in (21.0, 19.0, 17.0, 15.0, 13.0,
                                11.0, 9.0, 7.0, 5.0, 3.0)]
# exp Taylor coefficients 1/i!, i = 14..2 (Horner order).
_EXP_COEFFS = []
_f = 1.0
for _i in range(2, 15):
    _f = _f * float(_i)
    _EXP_COEFFS.append(1.0 / _f)
_EXP_COEFFS.reverse()

# Power-of-two cascade levels: (shift, 2^shift as exact double).
_POW2 = [(32, 4294967296.0), (16, 65536.0), (8, 256.0),
         (4, 16.0), (2, 4.0), (1, 2.0)]


def _d(x: float) -> str:
    """A float literal BOTH engines type as DOUBLE.  Bare decimal
    literals are DECIMAL in DuckDB *and* Spark (the round-9 ladder
    overflowed DECIMAL(18) before this); e-notation literals are
    DOUBLE in both, and repr() is shortest-round-trip so the parsed
    double is bit-identical to the Python constant."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def _ln_steps():
    """The fixed op sequence for ln as (name, py_fn, sql_template)
    triples.  py_fn takes an env dict of prior step values; the SQL
    template references prior steps as ``{p}_<name>`` and the input
    as ``{arg}``.  KEEP THE TWO COLUMNS IN LOCKSTEP — the sweep test
    enforces bit-equality, this layout makes review trivial."""
    steps = [
        ("x0",
         lambda v: float(v["__arg__"]),
         "CAST({arg} AS DOUBLE)"),
        # bring (0,1) args up into [1, 2^64) with one exact 2^64 mult
        ("xp",
         lambda v: v["x0"] * _TWO64 if v["x0"] < 1.0 else v["x0"],
         "CASE WHEN {p}_x0 < 1.0e0 THEN {p}_x0 * %s ELSE {p}_x0 END"
         % _d(_TWO64)),
        ("ep",
         lambda v: -64.0 if v["x0"] < 1.0 else 0.0,
         "CASE WHEN {p}_x0 < 1.0e0 THEN -64.0e0 ELSE 0.0e0 END"),
    ]
    prev_m, prev_e = "xp", "ep"
    for shift, p2 in _POW2:
        m_name, e_name = f"m{shift}", f"e{shift}"
        steps.append((
            m_name,
            (lambda pm, pv: lambda v: (v[pm] / pv if v[pm] >= pv
                                       else v[pm]))(prev_m, p2),
            "CASE WHEN {p}_%s >= %s THEN {p}_%s / %s ELSE {p}_%s END"
            % (prev_m, _d(p2), prev_m, _d(p2), prev_m)))
        steps.append((
            e_name,
            (lambda pm, pe, pv, sh: lambda v:
             (v[pe] + float(sh) if v[pm] >= pv else v[pe]))(
                 prev_m, prev_e, p2, shift),
            "CASE WHEN {p}_%s >= %s THEN {p}_%s + %s ELSE {p}_%s END"
            % (prev_m, _d(p2), prev_e, _d(float(shift)), prev_e)))
        prev_m, prev_e = m_name, e_name
    steps += [
        # m in [1,2): halve once more above sqrt(2) so |t| <= 0.1716
        ("mf",
         lambda v: v["m1"] * 0.5 if v["m1"] > _SQRT2 else v["m1"],
         "CASE WHEN {p}_m1 > %s THEN {p}_m1 * 0.5e0 ELSE {p}_m1 END"
         % _d(_SQRT2)),
        ("ef",
         lambda v: v["e1"] + 1.0 if v["m1"] > _SQRT2 else v["e1"],
         "CASE WHEN {p}_m1 > %s THEN {p}_e1 + 1.0e0 ELSE {p}_e1 END"
         % _d(_SQRT2)),
        ("t",
         lambda v: (v["mf"] - 1.0) / (v["mf"] + 1.0),
         "({p}_mf - 1.0e0) / ({p}_mf + 1.0e0)"),
        ("t2",
         lambda v: v["t"] * v["t"],
         "{p}_t * {p}_t"),
    ]
    prev = None
    for i, c in enumerate(_LN_COEFFS):
        name = f"s{i}"
        if prev is None:
            steps.append((name,
                          (lambda cc: lambda v: cc)(c),
                          "%s" % _d(c)))
        else:
            steps.append((
                name,
                (lambda cc, pp: lambda v: cc + v["t2"] * v[pp])(c, prev),
                "%s + {p}_t2 * {p}_%s" % (_d(c), prev)))
        prev = name
    steps += [
        ("ser",
         (lambda pp: lambda v: 1.0 + v["t2"] * v[pp])(prev),
         "1.0e0 + {p}_t2 * {p}_%s" % prev),
        ("lnm",
         lambda v: (v["t"] + v["t"]) * v["ser"],
         "({p}_t + {p}_t) * {p}_ser"),
        ("res",
         lambda v: v["lnm"] + v["ef"] * _LN2,
         "{p}_lnm + {p}_ef * %s" % _d(_LN2)),
    ]
    return steps


def _exp_steps():
    """Fixed op sequence for exp — same lockstep layout as _ln_steps.
    FLOOR is IEEE roundTowardNegative (exact on every engine); Spark's
    floor() returns BIGINT so the cast pins the type, not the value."""
    steps = [
        ("y0",
         lambda v: float(v["__arg__"]),
         "CAST({arg} AS DOUBLE)"),
        ("kf",
         lambda v: float(__import__("math").floor(
             v["y0"] * _INV_LN2 + 0.5)),
         "CAST(FLOOR({p}_y0 * %s + 0.5e0) AS DOUBLE)" % _d(_INV_LN2)),
        ("r",
         lambda v: v["y0"] - v["kf"] * _LN2,
         "{p}_y0 - {p}_kf * %s" % _d(_LN2)),
    ]
    prev = None
    for i, c in enumerate(_EXP_COEFFS):
        name = f"q{i}"
        if prev is None:
            steps.append((name,
                          (lambda cc: lambda v: cc)(c),
                          "%s" % _d(c)))
        else:
            steps.append((
                name,
                (lambda cc, pp: lambda v: cc + v["r"] * v[pp])(c, prev),
                "%s + {p}_r * {p}_%s" % (_d(c), prev)))
        prev = name
    steps += [
        ("q1x",
         (lambda pp: lambda v: 1.0 + v["r"] * v[pp])(prev),
         "1.0e0 + {p}_r * {p}_%s" % prev),
        ("er",
         lambda v: 1.0 + v["r"] * v["q1x"],
         "1.0e0 + {p}_r * {p}_q1x"),
    ]
    prev_v, prev_k = "er", "kf"
    for shift, p2 in _POW2:
        v_name, k_name = f"v{shift}", f"k{shift}"
        steps.append((
            v_name,
            (lambda pv, pk, p2v, sh: lambda v:
             (v[pv] * p2v if v[pk] >= float(sh)
              else (v[pv] / p2v if v[pk] <= -float(sh) else v[pv])))(
                 prev_v, prev_k, p2, shift),
            ("CASE WHEN {p}_%s >= %s THEN {p}_%s * %s "
             "WHEN {p}_%s <= %s THEN {p}_%s / %s ELSE {p}_%s END")
            % (prev_k, _d(float(shift)), prev_v, _d(p2),
               prev_k, _d(-float(shift)), prev_v, _d(p2), prev_v)))
        steps.append((
            k_name,
            (lambda pk, sh: lambda v:
             (v[pk] - float(sh) if v[pk] >= float(sh)
              else (v[pk] + float(sh) if v[pk] <= -float(sh)
                    else v[pk])))(prev_k, shift),
            ("CASE WHEN {p}_%s >= %s THEN {p}_%s - %s "
             "WHEN {p}_%s <= %s THEN {p}_%s + %s ELSE {p}_%s END")
            % (prev_k, _d(float(shift)), prev_k, _d(float(shift)),
               prev_k, _d(-float(shift)), prev_k, _d(float(shift)), prev_k)))
        prev_v, prev_k = v_name, k_name
    steps.append(("res",
                  (lambda pv: lambda v: v[pv])(prev_v),
                  "{p}_%s" % prev_v))
    return steps


_LN_STEPS = _ln_steps()
_EXP_STEPS = _exp_steps()


def _run(steps, x: float) -> float:
    env = {"__arg__": x}
    for name, fn, _sql in steps:
        env[name] = fn(env)
    return env["res"]


def fxln(x: float) -> float:
    """ln(x) as the fixed IEEE-double op sequence — bit-identical on
    CPython / Spark / DuckDB when they evaluate the paired SQL."""
    if not (2.0 ** -64 <= x < 2.0 ** 64):
        raise ValueError(f"fxln domain is [2^-64, 2^64): {x!r}")
    return _run(_LN_STEPS, x)


def fxexp(x: float) -> float:
    """exp(x) as the fixed IEEE-double op sequence (|x| < 43.6)."""
    if not (abs(x) < 43.6):
        raise ValueError(f"fxexp domain is |x| < 43.6: {x!r}")
    return _run(_EXP_STEPS, x)


def round_half_away(x: float) -> int:
    """SQL ROUND(x) (Spark HALF_UP on BigDecimal, DuckDB std::round):
    round-half-away-from-zero on the EXACT binary value.  Decimal(x)
    converts the double exactly, so the .5 tie test is exact too —
    floor(x+0.5) is NOT (0.49999999999999994 + 0.5 == 1.0; ADVICE r8)."""
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def micro(x: float) -> int:
    """``CAST(ROUND(x * 1e6) AS BIGINT)`` exactly as SQL evaluates it:
    one double multiply, then half-away-from-zero on the product."""
    return round_half_away(x * 1e6)


def fxln_micro(x: float) -> int:
    """``CAST(ROUND(<fxln chain>(x) * 1e6) AS BIGINT)``."""
    return micro(fxln(x))


def _emit(steps, arg_sql: str, tag: str):
    """[(column_name, sql_expr)] for one chain instance named ``tag``."""
    out = []
    for name, _fn, sql in steps:
        out.append((f"{tag}_{name}",
                    sql.format(arg=arg_sql, p=tag)))
    return out


def ladder_sql(inner: str, lns=(), exps=()) -> str:
    """Wrap relation SQL ``inner`` in nested one-column-per-step
    SELECTs computing fixed-op ln/exp columns.

    ``lns``/``exps``: iterables of (arg_sql, out_col).  Each out_col
    lands as a DOUBLE named ``<out_col>``; intermediates are
    ``_fx_<out_col>_<step>`` (callers project explicit columns above
    the ladder, so intermediates never leak into results).  arg_sql
    for a later entry may reference an earlier entry's out_col
    (nested ln(ln(x)) composes) and ``exps`` chains see ``lns``
    outputs (pow(x,a) = exp(a·ln x) composes).

    Emitted as one subquery holding a sibling-CTE chain of CHUNKED
    nested projections: each CTE nests at most ``_CHUNK`` one-column
    SELECTs over the previous CTE.  Both failure modes are real and
    were hit in round 9: fully-nested subqueries blow DuckDB's
    recursive-descent parser stack at ~120 levels (the 5-chain PMI
    ladder), and one-CTE-per-step blows Catalyst's analyzer iteration
    cap at ~60 CTEs.  Chunking keeps parse depth <= ~10 AND CTE count
    <= ~20 for every ladder in the repo — portable 1992 SQL, no
    lateral aliases; both optimizers collapse it to one projection."""
    head = inner.lstrip().upper()
    base = inner if head.startswith(("SELECT", "WITH")) \
        else f"SELECT * FROM {inner}"
    chains = [(a, o, _LN_STEPS) for a, o in lns] + \
             [(a, o, _EXP_STEPS) for a, o in exps]
    _CHUNK = 8
    ctes = [f"_fx_base AS ({base})"]
    prev = "_fx_base"
    n_cte = 0
    for arg_sql, out_col, steps in chains:
        cols = _emit(steps, arg_sql, f"_fx_{out_col}")
        cols.append((out_col, f"_fx_{out_col}_res"))
        for ci in range(0, len(cols), _CHUNK):
            chunk = cols[ci:ci + _CHUNK]
            sql = f"SELECT * FROM {prev}"
            for col, expr in chunk:
                sql = f"SELECT *, {expr} AS {col} FROM ({sql})"
            n_cte += 1
            name = f"_fx_{out_col}_g{n_cte}"
            ctes.append(f"{name} AS ({sql})")
            prev = name
    return "WITH " + ",\n ".join(ctes) + f" SELECT * FROM {prev}"
