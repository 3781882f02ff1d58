"""The 10 constraint-type correction-lookup kernels as set-at-a-time
DataFrame plans.

Each kernel transcribes one `buildCorrectionsLookupQueries` SPARQL shape
(`corhist/.../dataset/queries/*QueriesBuilder.java`) into joins over:

- ``dels``/``adds``: the per-revision diff graphs (edits + revision
  metadata; ``g`` = parent revision = the pre-correction global state,
  per `#previousRevision/#globalState`),
- ``state``: the interval-form reconstructed KB (state.py), columns
  prefixed ``st_`` to keep join plans unambiguous,
- ``closure``: interval-form P279 transitive closure (canonicalize.py),
- ``constraints``: broadcast, parameters pre-flattened to typed columns
  (prepare_constraints).

All constraints of a type run in ONE plan — the reference loops
constraint-at-a-time (`corhist/.../mining/Main.java:89`); here the
constraint table rides along as a broadcast join key, the scale-correct
shape (a handful of shuffles total instead of thousands of tiny jobs).

Output rows (pre-expansion candidates) mirror the SELECT DISTINCT
projections: (constraint_id, property, target_subj, target_obj, is_add,
corr_subj, corr_pred, corr_obj, corr_rev).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schemas as S

ROW_COLS = [
    "constraint_id",
    "property",
    "target_subj",
    "target_obj",
    "is_add",
    "corr_subj",
    "corr_pred",
    "corr_obj",
    "corr_rev",
]


def _jvm_regex_compiles(spark, pattern: str) -> bool:
    """Validate with java.util.regex.Pattern — the SAME engine that
    executes regexp_like on the executors and that the reference
    validates with (`FormatQueriesBuilder.java:55-74` uses
    Pattern.compile).  Python's re both rejects Java-only syntax
    (possessive quantifiers, \\p{IsAlphabetic}) and accepts Python-only
    syntax ((?P<n>...)) — either way acceptance would diverge from
    execution.  Falls back to Python re only when no JVM is reachable
    (never in practice — the session exists by the time kernels run)."""
    try:
        jvm = spark._jvm
        jvm.java.util.regex.Pattern.compile(pattern)
        return True
    except AttributeError:  # no py4j gateway (spark-connect-like stub)
        try:
            re.compile(pattern)
            return True
        except re.error:
            return False
    except Exception:  # Py4JJavaError: PatternSyntaxException
        return False


def prepare_constraints(spark, constraints_pdf) -> DataFrame:
    """Flatten constraint parameters into typed columns (driver-side —
    the constraint table is thousands of rows at most and is broadcast
    everywhere).  Regex validation follows
    `FormatQueriesBuilder.java:55-74`: first compilable pattern wins,
    fallback '^.*$'; compilability is judged by the JVM regex engine."""
    rows = []
    for r in constraints_pdf.to_dict("records"):
        params = r.get("params") or {}
        rels_param = (params.get(S.PARAM_RELATION) or [S.REL_INSTANCE])[0]
        rels = {
            S.REL_INSTANCE: [S.INSTANCE_OF],
            S.REL_SUBCLASS: [S.SUBCLASS_OF],
            S.REL_INSTANCE_OR_SUBCLASS: [S.INSTANCE_OF, S.SUBCLASS_OF],
        }.get(rels_param, [S.INSTANCE_OF])
        regex = None
        if r["type"] == S.TYPE_FORMAT:
            regex = "^.*$"
            for rx in params.get(S.PARAM_REGEX, []):
                if _jvm_regex_compiles(spark, "^" + rx + "$"):
                    regex = "^" + rx + "$"
                    break
        prop_param = (params.get(S.PARAM_PROPERTY) or [None])[0]
        rows.append(
            {
                "constraint_id": r["constraint_id"],
                "property": r["property"],
                "type": r["type"],
                "inv_pred": r["property"] if r["type"] == S.TYPE_SYMMETRIC else prop_param,
                "p2_pred": prop_param,
                "items": params.get(S.PARAM_ITEM) or [],
                "classes": params.get(S.PARAM_CLASS) or [],
                "rels": rels,
                "regex_anchored": regex,
            }
        )
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("constraint_id", StringType()),
            StructField("property", StringType()),
            StructField("type", StringType()),
            StructField("inv_pred", StringType()),
            StructField("p2_pred", StringType()),
            StructField("items", ArrayType(StringType())),
            StructField("classes", ArrayType(StringType())),
            StructField("rels", ArrayType(StringType())),
            StructField("regex_anchored", StringType()),
        ]
    )
    from .localframe import local_df

    return local_df(spark, rows, schema)


def _st(state: DataFrame) -> DataFrame:
    return state.select(
        F.col("subj").alias("st_subj"),
        F.col("pred").alias("st_pred"),
        F.col("obj").alias("st_obj"),
        F.col("from_rev").alias("st_from"),
        F.col("to_rev").alias("st_to"),
    )


def _cl(closure: DataFrame) -> DataFrame:
    return closure.select(
        F.col("cls").alias("cl_cls"),
        F.col("anc").alias("cl_anc"),
        F.col("from_rev").alias("cl_from"),
        F.col("to_rev").alias("cl_to"),
    )


def _asof(g_col):
    return (F.col("st_from") <= g_col) & (g_col < F.col("st_to"))


def _cl_asof(g_col):
    return (F.col("cl_from") <= g_col) & (g_col < F.col("cl_to"))


def _diff_with_meta(edits: DataFrame, revisions: DataFrame, op: str, need_prev: bool) -> DataFrame:
    d = (
        edits.filter(F.col("op") == op)
        .join(revisions.select("rev_id", F.col("parent_rev_id").alias("g")), "rev_id")
        .select("rev_id", "subj", "pred", "obj", "g")
    )
    if need_prev:
        d = d.filter(F.col("g").isNotNull())
    return d


def _sameas_adds(edits: DataFrame) -> DataFrame:
    return (
        edits.filter((F.col("op") == "add") & (F.col("pred") == S.SAME_AS))
        .select(F.col("rev_id").alias("sa_rev"), F.col("subj").alias("sa_subj"))
        .distinct()
    )


def _anti_sameas(df: DataFrame, sameas: DataFrame) -> DataFrame:
    """`FILTER NOT EXISTS { GRAPH ?add { ?s owl:sameAs ?red } }`."""
    return df.join(
        sameas,
        (F.col("rev_id") == F.col("sa_rev")) & (F.col("subj") == F.col("sa_subj")),
        "left_anti",
    )


def _emit(df: DataFrame, *, target_subj, target_obj, is_add, corr_subj, corr_pred, corr_obj) -> DataFrame:
    return df.select(
        F.col("constraint_id"),
        F.col("property"),
        F.col(target_subj).alias("target_subj"),
        F.col(target_obj).alias("target_obj"),
        F.lit(is_add).alias("is_add"),
        F.col(corr_subj).alias("corr_subj"),
        F.col(corr_pred).alias("corr_pred"),
        F.col(corr_obj).alias("corr_obj"),
        F.col("rev_id").cast("long").alias("corr_rev"),
    )


# The reference's volume guard (`AbstractQueriesBuilder.java:56-60`):
# for the Type / ValueType / TargetRequiredClaim / Item lookups —
# the four kernels whose builders call buildSamplingConstraint
# (`TypeQueriesBuilder.java:32,47`, `ValueTypeQueriesBuilder.java:32,47`,
# `TargetRequiredClaimQueriesBuilder.java:43,56`,
# `ItemQueriesBuilder.java:42,52`) — candidate revisions are modulo-
# sampled when the constraint's property is huge:
#   div = max(1, current_instances(property) / 1_000_000)
#   keep iff rev_id % div == 0
# where current_instances is COUNT(*) of `?s prop ?o` in the CURRENT
# state (`ConstraintViolationCorrectionLookup.java:237-245`).  At
# Wikidata scale this is semantics-bearing for P31-sized properties;
# below the threshold div = 1 and the filter is the identity.
SAMPLING_THRESHOLD = 1_000_000

SAMPLED_TYPES = frozenset(
    {S.TYPE_TYPE, S.TYPE_VALUE_TYPE, S.TYPE_TARGET_CLAIM, S.TYPE_ITEM}
)


def _with_sampling_div(
    constraints: DataFrame, state: DataFrame, sampling_threshold: int
) -> DataFrame:
    """Attach the per-constraint sampling divisor as a ``div`` column.

    The per-property instance counts come from ONE partial-aggregate
    count over the current state restricted to the (driver-small) set
    of sampled-constraint properties — the distributed analogue of the
    reference's per-constraint COUNT(*) query; the result is
    property-count-sized and collected, so ``div`` rides along as a
    literal inside the broadcast constraint table instead of forcing a
    join into every kernel plan."""
    rows = constraints.select("type", "property").distinct().collect()
    props = sorted({r["property"] for r in rows if r["type"] in SAMPLED_TYPES})
    counts: dict[str, int] = {}
    if props:
        counts = {
            r["pred"]: int(r["cnt"])
            for r in (
                state.filter(
                    (F.col("to_rev") == S.MAX_REV) & F.col("pred").isin(props)
                )
                .groupBy("pred")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            )
        }
    divs = {p: max(1, counts.get(p, 0) // sampling_threshold) for p in props}
    div_expr = F.lit(1).cast("long")
    if divs:
        mapping = F.create_map(
            *[F.lit(x) for p, d in sorted(divs.items()) for x in (p, d)]
        )
        div_expr = F.when(
            F.col("type").isin(*SAMPLED_TYPES),
            F.coalesce(F.element_at(mapping, F.col("property")), F.lit(1)),
        ).otherwise(F.lit(1)).cast("long")
    return constraints.withColumn("div", div_expr)


def _sampled(df: DataFrame) -> DataFrame:
    """`FILTER(?revId / div = ROUND(?revId / div))` == rev_id % div = 0."""
    return df.filter(F.col("rev_id") % F.col("div") == 0)


def correction_candidates(
    edits: DataFrame,
    revisions: DataFrame,
    state: DataFrame,
    closure: DataFrame,
    constraints: DataFrame,
    sampling_threshold: int = SAMPLING_THRESHOLD,
) -> DataFrame:
    """Union of all kernels' candidate rows, DISTINCT (the queries are
    SELECT DISTINCT)."""
    # skip kernels with no constraint of that type — the constraint
    # table is driver-small, so prune the plan before it is built
    present = {r["type"] for r in constraints.select("type").collect()}
    known = {
        S.TYPE_SINGLE, S.TYPE_UNIQUE, S.TYPE_INVERSE, S.TYPE_SYMMETRIC,
        S.TYPE_TYPE, S.TYPE_VALUE_TYPE, S.TYPE_TARGET_CLAIM, S.TYPE_ITEM,
        S.TYPE_CONFLICT, S.TYPE_ONE_OF, S.TYPE_FORMAT,
    }
    if not present & known:
        # every constraint has an unrecognized type QID — real WDQS
        # dumps carry dozens of types beyond the ten implemented here,
        # and the reference silently skips them (`mining/Main.java:89`
        # only dispatches known builders); an empty candidate set is
        # the correct result, not an error.  Checked BEFORE the eager
        # diff checkpoints below so the no-op case pays nothing.
        schema = ", ".join(
            f"{c} {'boolean' if c == 'is_add' else 'long' if c == 'corr_rev' else 'string'}"
            for c in ROW_COLS
        )
        return edits.sparkSession.createDataFrame([], schema)

    # the per-op diff frames (edits x revision metadata) are shared by
    # every kernel; materialize them once so an 8-kernel one-pass plan
    # does not rebuild the same shuffle in every union branch.  The
    # (3x larger) additions frame is only materialized when a present
    # constraint type actually has an addition branch — checkpointing
    # is EAGER, so building it for a deletions-only constraint set
    # would pay a full materialization for nothing.
    if present & SAMPLED_TYPES:
        constraints = _with_sampling_div(constraints, state, sampling_threshold)
    else:
        constraints = constraints.withColumn("div", F.lit(1).cast("long"))

    dels_nop = _diff_with_meta(edits, revisions, "del", need_prev=False).localCheckpoint()
    dels = dels_nop.filter(F.col("g").isNotNull())
    needs_adds = {
        S.TYPE_INVERSE, S.TYPE_SYMMETRIC, S.TYPE_TYPE,
        S.TYPE_VALUE_TYPE, S.TYPE_TARGET_CLAIM, S.TYPE_ITEM,
    }
    adds = (
        _diff_with_meta(edits, revisions, "add", need_prev=True).localCheckpoint()
        if present & needs_adds
        else None
    )
    sameas = _sameas_adds(edits)
    state = _st(state)
    closure = _cl(closure)
    del_triples = edits.filter(F.col("op") == "del").select(
        F.col("rev_id").alias("dt_rev"),
        F.col("subj").alias("dt_subj"),
        F.col("pred").alias("dt_pred"),
        F.col("obj").alias("dt_obj"),
    )
    add_triples = edits.filter(F.col("op") == "add").select(
        F.col("rev_id").alias("at_rev"),
        F.col("subj").alias("at_subj"),
        F.col("pred").alias("at_pred"),
        F.col("obj").alias("at_obj"),
    )

    def cons(t):
        types = t if isinstance(t, (list, tuple)) else [t]
        if not present.intersection(types):
            return None
        return F.broadcast(constraints.filter(F.col("type").isin(*types)))

    def maybe(fn, c, *args, **kw):
        return fn(*args, cons=c, **kw) if c is not None else None

    parts = [
        maybe(_single, cons(S.TYPE_SINGLE), dels, state, del_triples),
        maybe(_unique, cons(S.TYPE_UNIQUE), dels, state, sameas),
        maybe(_inverse, cons([S.TYPE_INVERSE, S.TYPE_SYMMETRIC]), dels, adds, state, sameas),
        maybe(_type_like, cons(S.TYPE_TYPE), dels, adds, state, closure, sameas, del_triples, add_triples, on_object=False),
        maybe(_type_like, cons(S.TYPE_VALUE_TYPE), dels, adds, state, closure, sameas, del_triples, add_triples, on_object=True),
        maybe(_claim_like, cons(S.TYPE_TARGET_CLAIM), dels, adds, state, sameas, on_object=True),
        maybe(_claim_like, cons(S.TYPE_ITEM), dels, adds, state, sameas, on_object=False),
        maybe(_conflict, cons(S.TYPE_CONFLICT), dels, state, del_triples),
        maybe(_one_of, cons(S.TYPE_ONE_OF), dels_nop, sameas),
        maybe(_format, cons(S.TYPE_FORMAT), dels_nop, sameas),
    ]
    parts = [p for p in parts if p is not None]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


# --- kernels -------------------------------------------------------------


def _single(dels, state, del_triples, cons):
    """`SingleValueQueriesBuilder.java:23-36`.

    Skew note: the state join key is (subj, pred) — entity-scoped, so a
    key's group size is bounded by one entity's statement count for one
    property (small even on the largest Wikidata items).  No salting:
    the key space is already high-cardinality, unlike `_unique`'s
    value-keyed join below."""
    d = dels.join(cons, F.col("pred") == F.col("property"))
    j = d.join(
        state,
        (F.col("st_subj") == F.col("subj"))
        & (F.col("st_pred") == F.col("pred"))
        & _asof(F.col("g"))
        & (F.col("st_obj") != F.col("obj")),
    )
    j = j.join(
        del_triples,
        (F.col("dt_rev") == F.col("rev_id"))
        & (F.col("dt_subj") == F.col("subj"))
        & (F.col("dt_pred") == F.col("pred"))
        & (F.col("dt_obj") == F.col("st_obj")),
        "left_anti",
    )
    j = j.withColumn("t_obj", F.explode(F.array(F.col("obj"), F.col("st_obj"))))
    return _emit(
        j,
        target_subj="subj",
        target_obj="t_obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )


N_VALUE_SALTS = 8


def _unique(dels, state, sameas, cons, n_salts: int | None = None):
    """`UniqueValueQueriesBuilder.java:24-40`.

    Hot-value guard: the state join key is (pred, obj) — VALUE-keyed,
    the P31->Q5 shape where one value can carry an unbounded share of
    the corpus, putting a whole hot group on one reducer.  The join is
    salted: state rows scatter across ``n_salts`` sub-keys by subject
    hash and the (small, deletion-filtered) probe side replicates
    across all salts, so a hot value spreads over n_salts reducers.
    Result-identical to the unsalted join (every matching pair meets on
    exactly one salt); the reference's own guard is global modulo
    sampling (`AbstractQueriesBuilder.java:56-60`), which changes
    results — salting does not.

    ``n_salts`` defaults to max(N_VALUE_SALTS, defaultParallelism):
    the salt count must grow with the cluster or the hot group's
    per-task share stays constant while everything else scales out —
    the sf1 tier caught exactly that (a fixed 8-way salt left one task
    partially aggregating ~1/8th of a 100x candidate volume)."""
    if n_salts is None:
        n_salts = max(
            N_VALUE_SALTS, dels.sparkSession.sparkContext.defaultParallelism
        )
    d = _anti_sameas(dels.join(cons, F.col("pred") == F.col("property")), sameas)
    d = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_dsalt")
    )
    st = state.withColumn("_ssalt", F.pmod(F.hash("st_subj"), F.lit(n_salts)))
    j = d.join(
        st,
        (F.col("st_pred") == F.col("pred"))
        & (F.col("st_obj") == F.col("obj"))
        & (F.col("_ssalt") == F.col("_dsalt"))
        & _asof(F.col("g"))
        & (F.col("st_subj") != F.col("subj")),
    ).drop("_dsalt", "_ssalt")
    j = j.withColumn("t_subj", F.explode(F.array(F.col("subj"), F.col("st_subj"))))
    return _emit(
        j,
        target_subj="t_subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )


def _inverse(dels, adds, state, sameas, cons):
    """`InverseQueriesBuilder.java:27-52` (also symmetric)."""
    # deletion branch: inverse missing in prev state
    d = _anti_sameas(dels.join(cons, F.col("pred") == F.col("property")), sameas)
    d = d.join(
        state,
        (F.col("st_subj") == F.col("obj"))
        & (F.col("st_pred") == F.col("inv_pred"))
        & (F.col("st_obj") == F.col("subj"))
        & _asof(F.col("g")),
        "left_anti",
    )
    out = _emit(
        d,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )
    # addition branch: `?o inv ?s` added while `?s p ?o` in prev state;
    # the added triple is (subj=o, pred=inv, obj=s)
    a = adds.join(cons, F.col("pred") == F.col("inv_pred"))
    a = a.join(
        state,
        (F.col("st_subj") == F.col("obj"))
        & (F.col("st_pred") == F.col("property"))
        & (F.col("st_obj") == F.col("subj"))
        & _asof(F.col("g")),
    )
    out2 = _emit(
        a,
        target_subj="obj",
        target_obj="subj",
        is_add=True,
        corr_subj="subj",
        corr_pred="inv_pred",
        corr_obj="obj",
    )
    return out.unionByName(out2)


def _type_like(dels, adds, state, closure, sameas, del_triples, add_triples, cons, on_object):
    """`TypeQueriesBuilder.java:24-63` / `ValueTypeQueriesBuilder.java`.

    The `?s rel/P279* ?o2` path is the interval-closure join; reflexive
    hop handled by the direct `array_contains(classes, t)` check."""
    key = ["constraint_id", "rev_id", "subj", "obj"]
    carrier = "obj" if on_object else "subj"
    # deletion branch: carrier lacked the required class at g.
    # `buildSamplingConstraint` guards BOTH branches of this builder
    # (`TypeQueriesBuilder.java:32,47`) — rev_id % div == 0 with div
    # from the constraint's property instance count (`div` column).
    d = _sampled(_anti_sameas(dels.join(cons, F.col("pred") == F.col("property")), sameas))
    typed = d.join(
        state,
        (F.col("st_subj") == F.col(carrier))
        & F.expr("array_contains(rels, st_pred)")
        & _asof(F.col("g")),
    )
    # empty class parameter -> the SPARQL filter degenerates to
    # `NOT EXISTS { ?s rel/P279* ?o2 }` with ?o2 free: ANY typing edge
    # is evidence (`AbstractQueriesBuilder.convertValues` returns "")
    direct = typed.filter(
        (F.size("classes") == 0) | F.expr("array_contains(classes, st_obj)")
    ).select(*key)
    via = (
        typed.join(closure, (F.col("cl_cls") == F.col("st_obj")) & _cl_asof(F.col("g")))
        .filter(F.expr("array_contains(classes, cl_anc)"))
        .select(*key)
    )
    evidence = direct.union(via).distinct()
    d2 = d.join(evidence, key, "left_anti")
    out = _emit(
        d2,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )

    # addition branch: `carrier rel ?type` added; the type must reach
    # the classes in the CURRENT state (the subquery) AND at g
    a = _sampled(adds.join(cons, F.expr("array_contains(rels, pred)"))).select(
        "rev_id",
        F.col("subj").alias("carrier"),
        F.col("obj").alias("typ"),
        "g",
        "constraint_id",
        "property",
        "classes",
    )

    def reach(df, g_expr):
        direct_r = df.filter(F.expr("array_contains(classes, typ)"))
        via_r = (
            df.join(closure, (F.col("cl_cls") == F.col("typ")) & _cl_asof(g_expr))
            .filter(F.expr("array_contains(classes, cl_anc)"))
            .drop("cl_cls", "cl_anc", "cl_from", "cl_to")
        )
        return direct_r.unionByName(via_r).distinct()

    a = reach(a, F.lit(S.MAX_REV - 1))
    a = reach(a, F.col("g"))
    # prev-state evidence `?s prop ?o` (carrier = s for type, o for valueType)
    st_anchor = F.col("st_obj") if on_object else F.col("st_subj")
    j = a.join(
        state,
        (st_anchor == F.col("carrier")) & (F.col("st_pred") == F.col("property")) & _asof(F.col("g")),
    )
    # FILTER NOT EXISTS { GRAPH ?del { ?s prop ?o } }
    j = j.join(
        del_triples,
        (F.col("dt_rev") == F.col("rev_id"))
        & (F.col("dt_subj") == F.col("st_subj"))
        & (F.col("dt_pred") == F.col("property"))
        & (F.col("dt_obj") == F.col("st_obj")),
        "left_anti",
    )
    # `GRAPH ?add { carrier ?corrP ?type }` — corrP re-derived from adds
    j = j.join(
        add_triples,
        (F.col("at_rev") == F.col("rev_id"))
        & (F.col("at_subj") == F.col("carrier"))
        & (F.col("at_obj") == F.col("typ")),
    )
    out2 = _emit(
        j,
        target_subj="st_subj",
        target_obj="st_obj",
        is_add=True,
        corr_subj="carrier",
        corr_pred="at_pred",
        corr_obj="typ",
    )
    return out.unionByName(out2)


def _claim_like(dels, adds, state, sameas, cons, on_object):
    """`TargetRequiredClaimQueriesBuilder.java:35-63` /
    `ItemQueriesBuilder.java:34-58`."""
    key = ["constraint_id", "rev_id", "subj", "obj"]
    carrier = "obj" if on_object else "subj"
    # both branches carry the reference's modulo-sampling guard
    # (`TargetRequiredClaimQueriesBuilder.java:43,56`,
    # `ItemQueriesBuilder.java:42,52`); div is keyed by the
    # CONSTRAINT's property in the addition branch too (the reference
    # counts instances of constraint.getProperty(), not of p2)
    d = _sampled(_anti_sameas(dels.join(cons, F.col("pred") == F.col("property")), sameas))
    ev = (
        d.join(
            state,
            (F.col("st_subj") == F.col(carrier))
            & (F.col("st_pred") == F.col("p2_pred"))
            & _asof(F.col("g")),
        )
        .filter((F.size("items") == 0) | F.expr("array_contains(items, st_obj)"))
        .select(*key)
        .distinct()
    )
    d2 = d.join(ev, key, "left_anti")
    out = _emit(
        d2,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )
    # addition branch: `carrier p2 ?o2` added while `?s prop ?o` in prev
    # state; the added triple is (subj=carrier, pred=p2, obj=o2)
    a = _sampled(adds.join(cons, F.col("pred") == F.col("p2_pred"))).filter(
        (F.size("items") == 0) | F.expr("array_contains(items, obj)")
    )
    st_anchor = F.col("st_obj") if on_object else F.col("st_subj")
    j = a.join(
        state,
        (st_anchor == F.col("subj")) & (F.col("st_pred") == F.col("property")) & _asof(F.col("g")),
    )
    out2 = _emit(
        j,
        target_subj="st_subj",
        target_obj="st_obj",
        is_add=True,
        corr_subj="subj",
        corr_pred="p2_pred",
        corr_obj="obj",
    )
    return out.unionByName(out2)


def _conflict(dels, state, del_triples, cons):
    """`ConflictsWithQueriesBuilder.java:28-47` — both branches are
    deletions."""
    # branch a: deleted `s prop o` while conflicting `s p2 o2` in prev state
    d = dels.join(cons, F.col("pred") == F.col("property"))
    ja = (
        d.join(
            state,
            (F.col("st_subj") == F.col("subj"))
            & (F.col("st_pred") == F.col("p2_pred"))
            & _asof(F.col("g")),
        )
        .filter((F.size("items") == 0) | F.expr("array_contains(items, st_obj)"))
        .join(
            del_triples,
            (F.col("dt_rev") == F.col("rev_id"))
            & (F.col("dt_subj") == F.col("subj"))
            & (F.col("dt_pred") == F.col("p2_pred"))
            & (F.col("dt_obj") == F.col("st_obj")),
            "left_anti",
        )
    )
    out = _emit(
        ja,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )
    # branch b: deleted the conflicting `s p2 o2` while `s prop o` in prev
    d2 = dels.join(cons, F.col("pred") == F.col("p2_pred")).filter(
        (F.size("items") == 0) | F.expr("array_contains(items, obj)")
    )
    jb = d2.join(
        state,
        (F.col("st_subj") == F.col("subj"))
        & (F.col("st_pred") == F.col("property"))
        & _asof(F.col("g")),
    ).join(
        del_triples,
        (F.col("dt_rev") == F.col("rev_id"))
        & (F.col("dt_subj") == F.col("subj"))
        & (F.col("dt_pred") == F.col("property"))
        & (F.col("dt_obj") == F.col("st_obj")),
        "left_anti",
    )
    out2 = _emit(
        jb,
        target_subj="subj",
        target_obj="st_obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="p2_pred",
        corr_obj="obj",
    )
    return out.unionByName(out2)


def _one_of(dels_nop, sameas, cons):
    """`OneOfQueriesBuilder.java:24-38` — no prev-state join, empty
    item list yields nothing (empty VALUES group)."""
    d = dels_nop.join(cons, F.col("pred") == F.col("property")).filter(
        (F.size("items") > 0) & ~F.expr("array_contains(items, obj)")
    )
    d = _anti_sameas(d, sameas)
    return _emit(
        d,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )


def _format(dels_nop, sameas, cons):
    """`FormatQueriesBuilder.java:31-44` — regex validated driver-side,
    matched JVM-side (same Java regex family as the reference)."""
    d = dels_nop.join(cons, F.col("pred") == F.col("property")).filter(
        ~F.regexp_like(F.col("obj"), F.col("regex_anchored"))
    )
    d = _anti_sameas(d, sameas)
    return _emit(
        d,
        target_subj="subj",
        target_obj="obj",
        is_add=False,
        corr_subj="subj",
        corr_pred="property",
        corr_obj="obj",
    )
