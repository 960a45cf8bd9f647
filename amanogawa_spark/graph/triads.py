"""Directed triad census — the full 16-type Holland–Leinhardt census
over a digraph, distributed.

Edge patterns per type (the standard MAN naming — X mutual dyads,
Y asymmetric, Z null, D/U/C/T orientation subtypes):

    003   A, B, C                 111D  A<->B<-C
    012   A->B, C                 111U  A<->B->C
    102   A<->B, C                030T  A->B<-C, A->C
    021D  A<-B->C                 030C  A<-B<-C, A->C
    021U  A->B<-C                 201   A<->B<->C
    021C  A->B->C                 120D  A<-B->C, A<->C
                                  120U  A->B<-C, A<->C
                                  120C  A->B->C, A<->C
                                  210   A->B<->C, A<->C
                                  300   A<->B<->C, A<->C

Distributed shape (the Batagelj–Mrvar subquadratic census, Spark-first):

- Dyad table (a < b, code ∈ {1: a→b, 2: b→a, 3: mutual}) — one shuffle.
- OPEN 2-dyad triads = wedges through a center with the third pair
  anti-joined against the link table; each such triad has exactly one
  center, so it is counted exactly once. Classified by the two
  center-relative orientations (in/out/mutual).
- CLOSED triads enumerated once each via the ordered wedge join
  (a<b<c), classified from the 3 dyad codes by a generated 27-entry
  lookup (the same table the DuckDB oracle and the pure-Python
  isomorphism mirror in tests use).
- 1-dyad and 0-dyad types by subtraction: each dyad sits in (n−2)
  triads, so 012/102 fall out of the asymmetric/mutual dyad totals
  minus their appearances in ≥2-dyad types; 003 = C(n,3) − rest.

Cost honesty at 10^12 scale: open-wedge enumeration is Σ_c deg(c)² —
inherent to a full census (the answer itself depends on every
2-path). Hub-bounded graphs are fine; for raw web graphs run after
``graph.skew`` hub-splitting or on the host graph. Closed-triad
enumeration pivots on the id-ordered low endpoint (Σ low-deg² pairs)
— dominated by the open-wedge Σdeg² term, so the census's total cost
bound is unchanged. Counts are exact; note the 003/012/102 rows grow
as n·C(n,2)-ish and overflow int64 only at vertex counts where a full
census is itself meaningless (n > ~3·10^6 already has C(n,3) > 2^63 —
run on the host graph at that point).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# Edge patterns on labeled vertices (0, 1, 2) ~ (A, B, C).
_PATTERNS: dict[str, tuple[tuple[int, int], ...]] = {
    "003": (),
    "012": ((0, 1),),
    "102": ((0, 1), (1, 0)),
    "021D": ((1, 0), (1, 2)),
    "021U": ((0, 1), (2, 1)),
    "021C": ((0, 1), (1, 2)),
    "111D": ((0, 1), (1, 0), (2, 1)),
    "111U": ((0, 1), (1, 0), (1, 2)),
    "030T": ((0, 1), (2, 1), (0, 2)),
    "030C": ((1, 0), (2, 1), (0, 2)),
    "201": ((0, 1), (1, 0), (1, 2), (2, 1)),
    "120D": ((1, 0), (1, 2), (0, 2), (2, 0)),
    "120U": ((0, 1), (2, 1), (0, 2), (2, 0)),
    "120C": ((0, 1), (1, 2), (0, 2), (2, 0)),
    "210": ((0, 1), (1, 2), (2, 1), (0, 2), (2, 0)),
    "300": ((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)),
}


def _canon(edges: frozenset[tuple[int, int]]) -> frozenset:
    """Canonical form of a 3-vertex digraph: the lexicographically
    smallest edge set over the 6 vertex permutations."""
    best = None
    for p in permutations(range(3)):
        remapped = frozenset((p[u], p[v]) for u, v in edges)
        key = tuple(sorted(remapped))
        if best is None or key < best[0]:
            best = (key, remapped)
    return best[1]


def classify_triad(edges) -> str:
    """Name the triad class of a 3-vertex digraph given its edge set on
    vertices {0,1,2} — by isomorphism against the 16 patterns."""
    canon = _canon(frozenset(edges))
    for name, pat in _PATTERNS.items():
        if _canon(frozenset(pat)) == canon:
            return name
    raise ValueError(f"unclassifiable triad: {sorted(edges)}")


def _closed_lookup() -> dict[tuple[int, int, int], str]:
    """(code_ab, code_ac, code_bc) → class for a triangle a<b<c, where
    each code ∈ {1: low→high, 2: high→low, 3: mutual}. 27 entries,
    generated from the patterns via isomorphism — not hand-typed."""
    out = {}
    for cab in (1, 2, 3):
        for cac in (1, 2, 3):
            for cbc in (1, 2, 3):
                edges = set()
                for (u, v), code in (((0, 1), cab), ((0, 2), cac), ((1, 2), cbc)):
                    if code in (1, 3):
                        edges.add((u, v))
                    if code in (2, 3):
                        edges.add((v, u))
                out[(cab, cac, cbc)] = classify_triad(edges)
    return out


def _open_lookup() -> dict[tuple[str, str], str]:
    """(rel_u, rel_w) → class for an open wedge u–c–w (third pair null),
    where rel ∈ {'out': c→x, 'in': x→c, 'mut'} is the dyad's orientation
    relative to the CENTER c. Order-insensitive (sorted pair)."""
    # center = 0; 'out' = center→nbr, 'in' = nbr→center
    rels = {
        "out": lambda x: {(0, x)},
        "in": lambda x: {(x, 0)},
        "mut": lambda x: {(0, x), (x, 0)},
    }
    out = {}
    for ru in rels:
        for rw in rels:
            edges = rels[ru](1) | rels[rw](2)
            out[tuple(sorted((ru, rw)))] = classify_triad(edges)
    return out


CLOSED_LOOKUP = _closed_lookup()
OPEN_LOOKUP = _open_lookup()


def _dyads(edges: DataFrame) -> DataFrame:
    """(a, b, code) with a < b; code 1 = a→b only, 2 = b→a only,
    3 = mutual. Self-loops dropped, parallel edges merged."""
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
    )
    return (
        e.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
            F.when(F.col("src_id") < F.col("dst_id"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("c0"),
        )
        .groupBy("a", "b")
        .agg(F.sum("c0").alias("code"))  # 1, 2, or 1+2=3
    )


def triad_census(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """(triad_type, count) — 16 rows, one per Holland–Leinhardt class,
    summing to C(n,3) over the given vertex set."""
    spark = vertices.sparkSession
    dyads = _dyads(edges).persist()
    n = vertices.select("id").distinct().count()

    # --- closed triads: ordered triangle enumeration a<b<c --------------
    d_ab = dyads.select(F.col("a"), F.col("b"), F.col("code").alias("code_ab"))
    d_ac = dyads.select(
        F.col("a"), F.col("b").alias("c"), F.col("code").alias("code_ac")
    )
    d_bc = dyads.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.col("code").alias("code_bc")
    )
    tri = (
        d_ab.join(d_ac, "a")
        .filter(F.col("b") < F.col("c"))
        .join(d_bc, ["b", "c"])
    )
    closed_case = F.when(F.lit(False), F.lit(""))
    for (cab, cac, cbc), name in CLOSED_LOOKUP.items():
        closed_case = closed_case.when(
            (F.col("code_ab") == cab)
            & (F.col("code_ac") == cac)
            & (F.col("code_bc") == cbc),
            F.lit(name),
        )
    closed = (
        tri.select(closed_case.alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count("*").alias("count"))
    )

    # --- open 2-dyad triads: wedges with null third pair ----------------
    # center-relative incidence: for dyad (a,b,code), from a's view the
    # dyad to b is out (code 1), in (code 2), or mut (3); symmetric for b.
    rel = F.when(F.col("code") == 3, F.lit("mut"))
    inc = dyads.select(
        F.col("a").alias("ctr"),
        F.col("b").alias("nbr"),
        rel.when(F.col("code") == 1, F.lit("out")).otherwise(F.lit("in")).alias("rel"),
    ).unionAll(
        dyads.select(
            F.col("b").alias("ctr"),
            F.col("a").alias("nbr"),
            rel.when(F.col("code") == 2, F.lit("out"))
            .otherwise(F.lit("in"))
            .alias("rel"),
        )
    )
    w1 = inc.select("ctr", F.col("nbr").alias("u"), F.col("rel").alias("rel_u"))
    w2 = inc.select("ctr", F.col("nbr").alias("w"), F.col("rel").alias("rel_w"))
    wedges = (
        w1.join(w2, "ctr")
        .filter(F.col("u") < F.col("w"))
        .join(
            dyads.select(F.col("a").alias("u"), F.col("b").alias("w")),
            ["u", "w"],
            "left_anti",
        )
    )
    open_case = F.when(F.lit(False), F.lit(""))
    for (ru, rw), name in OPEN_LOOKUP.items():
        open_case = open_case.when(
            (F.least("rel_u", "rel_w") == ru) & (F.greatest("rel_u", "rel_w") == rw),
            F.lit(name),
        )
    open_ = (
        wedges.select(open_case.alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count("*").alias("count"))
    )

    # --- 1-dyad and 0-dyad types by subtraction --------------------------
    counted = closed.unionAll(open_).groupBy("triad_type").agg(
        F.sum("count").alias("count")
    )
    got = {r["triad_type"]: r["count"] for r in counted.collect()}
    dy = dyads.agg(
        F.sum(F.when(F.col("code") == 3, 1).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("code") != 3, 1).otherwise(0)).alias("asym"),
    ).collect()[0]
    m_cnt, a_cnt = int(dy["m"] or 0), int(dy["asym"] or 0)
    dyads.unpersist()

    def _dyad_content(name: str) -> tuple[int, int]:
        """(mutual, asymmetric) dyad counts inside one triad of class name."""
        edges_ = _PATTERNS[name]
        s = set(edges_)
        mut = sum(
            1
            for u, v in [(0, 1), (0, 2), (1, 2)]
            if (u, v) in s and (v, u) in s
        )
        asym = sum(
            1
            for u, v in [(0, 1), (0, 2), (1, 2)]
            if ((u, v) in s) != ((v, u) in s)
        )
        return mut, asym

    used_m = sum(_dyad_content(t)[0] * c for t, c in got.items())
    used_a = sum(_dyad_content(t)[1] * c for t, c in got.items())
    got["102"] = m_cnt * (n - 2) - used_m
    got["012"] = a_cnt * (n - 2) - used_a
    total = n * (n - 1) * (n - 2) // 6
    got["003"] = total - sum(v for k, v in got.items() if k != "003")
    rows = [(t, int(got.get(t, 0))) for t in TRIAD_NAMES]
    return spark.createDataFrame(rows, "triad_type string, count long")
