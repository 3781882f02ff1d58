"""Deterministic synthetic corhist corpus (seed=42, no external data).

Builds the fixture tables of FIXTURES.md: an edit history (`revisions`,
`edits`) with *planted* constraint-violation-correction scenarios for
each of the 10 constraint types, shaped exactly like the correction
lookup queries of the reference
(`corhist/.../dataset/queries/*QueriesBuilder.java`), plus negative
cases (sameAs redirects, later reverts), expansion co-edits at
distance 0 and 1, a hot-entity cluster for skew, interleaved-span
`documents`, `sameas_edges` and `subclass_edges`.

Output is plain pandas DataFrames (tiny at test scale); `to_spark`
uploads them with the explicit schemas.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pandas as pd

from . import schemas as S


@dataclass
class RevisionLog:
    """Append-only edit history builder with per-entity parent chains."""

    rng: random.Random
    next_rev: int = 1
    revisions: list[dict] = field(default_factory=list)
    edits: list[dict] = field(default_factory=list)
    last_rev_of: dict[str, int] = field(default_factory=dict)

    def revise(
        self,
        entity: str,
        author: str,
        adds: list[tuple[str, str, str]] | None = None,
        dels: list[tuple[str, str, str]] | None = None,
        based_on: int | None = None,
    ) -> int:
        rev_id = self.next_rev
        self.next_rev += 1
        self.revisions.append(
            {
                "rev_id": rev_id,
                "entity": entity,
                "parent_rev_id": self.last_rev_of.get(entity),
                "author": author,
                "based_on_rev_id": based_on,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=rev_id * 61),
            }
        )
        self.last_rev_of[entity] = rev_id
        for op, triples in (("add", adds or []), ("del", dels or [])):
            for subj, pred, obj in triples:
                kind = "iri" if obj.startswith(("Q", "P")) else "string"
                self.edits.append(
                    {
                        "rev_id": rev_id,
                        "op": op,
                        "subj": subj,
                        "pred": pred,
                        "obj": obj,
                        "obj_kind": kind,
                    }
                )
        return rev_id


def default_constraints() -> list[dict]:
    """>=1 constraint per type; includes an invalid-regex format
    constraint (fallback '^.*$' path, `FormatQueriesBuilder.java:55-74`)
    and a type constraint with relation = instance-or-subclass-of."""
    c = []

    def add(cid, prop, ctype, params=None):
        c.append(
            {"constraint_id": cid, "property": prop, "type": ctype, "params": params or {}}
        )

    add("c-single-P10", "P10", S.TYPE_SINGLE)
    add("c-unique-P11", "P11", S.TYPE_UNIQUE)
    add("c-inverse-P12", "P12", S.TYPE_INVERSE, {S.PARAM_PROPERTY: ["P13"]})
    add("c-sym-P14", "P14", S.TYPE_SYMMETRIC)
    add(
        "c-type-P15",
        "P15",
        S.TYPE_TYPE,
        {S.PARAM_CLASS: ["Q900"], S.PARAM_RELATION: [S.REL_INSTANCE]},
    )
    add(
        "c-type2-P25",
        "P25",
        S.TYPE_TYPE,
        {S.PARAM_CLASS: ["Q900", "Q910"], S.PARAM_RELATION: [S.REL_INSTANCE_OR_SUBCLASS]},
    )
    add(
        "c-vtype-P16",
        "P16",
        S.TYPE_VALUE_TYPE,
        {S.PARAM_CLASS: ["Q900"], S.PARAM_RELATION: [S.REL_INSTANCE]},
    )
    add("c-tclaim-P17", "P17", S.TYPE_TARGET_CLAIM, {S.PARAM_PROPERTY: ["P18"]})
    add(
        "c-tclaimv-P26",
        "P26",
        S.TYPE_TARGET_CLAIM,
        {S.PARAM_PROPERTY: ["P18"], S.PARAM_ITEM: ["Q800", "Q801"]},
    )
    add("c-item-P19", "P19", S.TYPE_ITEM, {S.PARAM_PROPERTY: ["P20"]})
    add(
        "c-itemv-P27",
        "P27",
        S.TYPE_ITEM,
        {S.PARAM_PROPERTY: ["P20"], S.PARAM_ITEM: ["Q800"]},
    )
    add("c-conflict-P21", "P21", S.TYPE_CONFLICT, {S.PARAM_PROPERTY: ["P22"]})
    add(
        "c-conflictv-P28",
        "P28",
        S.TYPE_CONFLICT,
        {S.PARAM_PROPERTY: ["P22"], S.PARAM_ITEM: ["Q850"]},
    )
    add("c-oneof-P23", "P23", S.TYPE_ONE_OF, {S.PARAM_ITEM: ["Q700", "Q701"]})
    add("c-format-P24", "P24", S.TYPE_FORMAT, {S.PARAM_REGEX: ["[A-Z]{2}[0-9]+"]})
    add("c-formatbad-P29", "P29", S.TYPE_FORMAT, {S.PARAM_REGEX: ["["]})
    return c


HOT_ENTITY = "Q5"  # hot object cluster (skew target, like Q5/P31 on Wikidata)


def generate_corpus(seed: int = 42, scale: int = 12) -> dict[str, pd.DataFrame]:
    """Generate the full fixture set. ``scale`` ~ scenarios per type."""
    rng = random.Random(seed)
    log = RevisionLog(rng)
    authors = [f"u{i}" for i in range(8)]

    def auth():
        return rng.choice(authors)

    ei = [0]

    def ent() -> str:
        ei[0] += 1
        return f"Q{1000 + ei[0]}"

    def val(i=None) -> str:
        return f"Q{5000 + (i if i is not None else rng.randrange(400))}"

    # --- class hierarchy (P279 DAG, depth <= 4) -------------------------
    subclass_edges = [
        ("Q901", "Q900"),
        ("Q902", "Q901"),
        ("Q903", "Q902"),
        ("Q904", "Q900"),
        ("Q911", "Q910"),
        ("Q912", "Q911"),
        ("Q905", "Q900"),
        ("Q905", "Q910"),  # diamond
    ]
    # materialize hierarchy into the history so current-state closure
    # queries (Type addition branch) can see it
    for cls, parent in subclass_edges:
        log.revise(cls, auth(), adds=[(cls, S.SUBCLASS_OF, parent)])

    # ---- scenario planting per constraint type -------------------------
    # Scenario variants: 0 plain deletion-correction, 1 with distance-0
    # co-edit (replacement), 2 with distance-1 same-author co-edit,
    # 3 sameAs redirect (guard: excluded), 4 later revert (still-applied:
    # excluded), 5 addition-branch correction where the type has one.
    def plant(ctype: str, prop: str, i: int, variant: int):
        e = ent()
        a = auth()
        if ctype == S.TYPE_SINGLE:
            o1, o2 = val(i * 2), val(i * 2 + 1)
            log.revise(e, auth(), adds=[(e, prop, o1), (e, prop, o2)])
            if variant == 1:
                # replacement: del o1 + add a fresh same-pred value in one rev
                log.revise(e, a, dels=[(e, prop, o1)], adds=[(e, prop, val(i * 2 + 900))])
            elif variant == 3:
                # unrelated co-edit in the correcting revision (no p/o match)
                log.revise(e, a, dels=[(e, prop, o1)], adds=[(e, "P99", val())])
            else:
                log.revise(e, a, dels=[(e, prop, o1)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o1)])  # revert
        elif ctype == S.TYPE_UNIQUE:
            o = val(i)
            e2 = ent()
            log.revise(e, auth(), adds=[(e, prop, o)])
            log.revise(e2, auth(), adds=[(e2, prop, o)])
            # freshen e's parent revision so globalState(parent) already
            # contains e2's conflicting value (the lookup reads the
            # *parent* state, `UniqueValueQueriesBuilder.java:29-33`)
            log.revise(e, auth(), adds=[(e, "P95", val())])
            if variant == 3:
                # redirect-style fix: delete + add sameAs -> excluded
                log.revise(e, a, dels=[(e, prop, o)], adds=[(e, S.SAME_AS, e2)])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o)])
        elif ctype in (S.TYPE_INVERSE, S.TYPE_SYMMETRIC):
            inv = "P13" if ctype == S.TYPE_INVERSE else prop
            o = ent()
            log.revise(e, auth(), adds=[(e, prop, o)])
            if variant == 5:
                # addition branch: add the missing inverse on o.  Seed o
                # first — the lookup needs previousRevision(corrRev) to
                # exist (`InverseQueriesBuilder.java:46-48`).
                log.revise(o, auth(), adds=[(o, "P96", val())])
                log.revise(o, a, adds=[(o, inv, e)])
            elif variant == 4:
                log.revise(e, a, dels=[(e, prop, o)])
                log.revise(e, auth(), adds=[(e, prop, o)])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
        elif ctype in (S.TYPE_TYPE, S.TYPE_VALUE_TYPE):
            o = val(i) if ctype == S.TYPE_TYPE else ent()
            carrier = e if ctype == S.TYPE_TYPE else o  # who needs the type
            log.revise(e, auth(), adds=[(e, prop, o)])
            if variant == 5:
                # addition branch: give carrier a type in the class tree
                cls = rng.choice(["Q900", "Q901", "Q902", "Q904"])
                if carrier != e:
                    log.revise(carrier, auth(), adds=[(carrier, "P96", val())])
                log.revise(carrier, a, adds=[(carrier, S.INSTANCE_OF, cls)])
            elif variant == 3:
                log.revise(e, a, dels=[(e, prop, o)], adds=[(e, S.SAME_AS, ent())])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o)])
        elif ctype == S.TYPE_TARGET_CLAIM:
            o = ent()
            req_obj = "Q800" if prop == "P26" else val(i)
            log.revise(e, auth(), adds=[(e, prop, o)])
            if variant == 5:
                log.revise(o, auth(), adds=[(o, "P96", val())])
                log.revise(o, a, adds=[(o, "P18", req_obj)])
            elif variant == 3:
                log.revise(e, a, dels=[(e, prop, o)], adds=[(e, S.SAME_AS, ent())])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o)])
        elif ctype == S.TYPE_ITEM:
            o = val(i)
            req_obj = "Q800" if prop == "P27" else val(i + 7)
            log.revise(e, auth(), adds=[(e, prop, o)])
            if variant == 5:
                log.revise(e, a, adds=[(e, "P20", req_obj)])
            elif variant == 3:
                log.revise(e, a, dels=[(e, prop, o)], adds=[(e, S.SAME_AS, ent())])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o)])
        elif ctype == S.TYPE_CONFLICT:
            o = val(i)
            o2 = "Q850" if prop == "P28" else val(i + 3)
            log.revise(e, auth(), adds=[(e, prop, o), (e, "P22", o2)])
            if variant == 5:
                # branch b: delete the conflicting triple instead
                log.revise(e, a, dels=[(e, "P22", o2)])
            else:
                log.revise(e, a, dels=[(e, prop, o)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, o)])
        elif ctype == S.TYPE_ONE_OF:
            bad = val(i + 11)  # not in {Q700, Q701}
            log.revise(e, auth(), adds=[(e, prop, bad)])
            if variant == 3:
                log.revise(e, a, dels=[(e, prop, bad)], adds=[(e, S.SAME_AS, ent())])
            else:
                log.revise(e, a, dels=[(e, prop, bad)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, bad)])
        elif ctype == S.TYPE_FORMAT:
            bad = f"bad-{i}"  # fails ^[A-Z]{2}[0-9]+$
            log.revise(e, auth(), adds=[(e, prop, bad)])
            if variant == 3:
                log.revise(e, a, dels=[(e, prop, bad)], adds=[(e, S.SAME_AS, ent())])
            else:
                log.revise(e, a, dels=[(e, prop, bad)])
            if variant == 4:
                log.revise(e, auth(), adds=[(e, prop, bad)])

        # distance-1 same-author co-edit linked via isBasedOn; it carries a
        # triple sharing the main correction's subject+predicate so the
        # expansion's p-match branch fires at distance 1
        # (`...Lookup.java:128-145`)
        if variant == 2:
            e2 = ent()
            r_main = log.last_rev_of[e]
            log.revise(e2, a, adds=[(e, prop, val(i + 500))], based_on=r_main)

    constraints = default_constraints()
    by_prop = {c["property"]: c for c in constraints}
    for c in constraints:
        ctype, prop = c["type"], c["property"]
        has_add_branch = ctype in (
            S.TYPE_INVERSE,
            S.TYPE_SYMMETRIC,
            S.TYPE_TYPE,
            S.TYPE_VALUE_TYPE,
            S.TYPE_TARGET_CLAIM,
            S.TYPE_ITEM,
            S.TYPE_CONFLICT,
        )
        for i in range(scale):
            variant = i % (6 if has_add_branch else 5)
            plant(ctype, prop, i, variant)

    # ---- hot-entity skew cluster: many P31 -> Q5 edits -----------------
    for i in range(scale * 8):
        e = ent()
        log.revise(e, auth(), adds=[(e, S.INSTANCE_OF, HOT_ENTITY)])

    # ---- noise edits ---------------------------------------------------
    for i in range(scale * 6):
        e = ent()
        log.revise(e, auth(), adds=[(e, "P97", val())])
        if rng.random() < 0.3:
            log.revise(e, auth(), dels=[(e, "P97", val())])  # orphan del noise

    # ---- sameas edges (canonicalization input): chains + cliques -------
    sameas = []
    base = 8000
    for comp in range(scale):
        size = 2 + comp % 4
        ids = [f"Q{base + comp * 10 + j}" for j in range(size)]
        for a_, b_ in zip(ids, ids[1:]):
            sameas.append((a_, b_))
    sameas.append((HOT_ENTITY, f"Q{base}"))

    # ---- interleaved documents ----------------------------------------
    docs = []
    all_entities = sorted(log.last_rev_of)
    for d in range(scale * 40):
        n_spans = 1 + rng.randrange(12)
        spans, offset = [], 0
        for s_i in range(n_spans):
            kind = rng.choices(["text", "image", "audio", "table"], [0.7, 0.15, 0.1, 0.05])[0]
            if kind == "text":
                # embed entity mentions + property cues deterministically
                ments = rng.sample(all_entities, k=min(3, len(all_entities)))
                prop = rng.choice(list(by_prop))
                txt = f"span {d}-{s_i} mentions {' and '.join(ments)} via {prop} ."
                spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": offset})
                offset += len(txt)
            else:
                ref = f"media://{kind}/{d}/{s_i}"
                spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
                offset += 1
        # ~5% of docs mention the hot entity in an extra span
        if rng.random() < 0.05:
            txt = f"hot mention {HOT_ENTITY} ."
            spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": offset})
        docs.append({"doc_id": f"d{d}", "spans": spans})

    return {
        "revisions": pd.DataFrame(log.revisions),
        "edits": pd.DataFrame(log.edits),
        "constraints": pd.DataFrame(constraints),
        "sameas_edges": pd.DataFrame(sameas, columns=["src", "dst"]),
        "subclass_edges": pd.DataFrame(subclass_edges, columns=["cls", "parent"]),
        "documents": pd.DataFrame(docs),
    }


def to_spark(spark, corpus: dict[str, pd.DataFrame]):
    """Upload the pandas fixture tables as DataFrames with our schemas."""
    out = {}
    schema_of = {
        "revisions": S.REVISIONS,
        "edits": S.EDITS,
        "constraints": S.CONSTRAINTS,
        "sameas_edges": S.SAMEAS_EDGES,
        "subclass_edges": S.SUBCLASS_EDGES,
        "documents": S.DOCUMENTS,
    }
    for name, pdf in corpus.items():
        rows = pdf.to_dict("records")
        for row in rows:
            for k, v in row.items():
                if isinstance(v, float):
                    # pandas upcasts nullable int columns to float/NaN
                    row[k] = None if v != v else int(v)
                elif isinstance(v, pd.Timestamp):
                    row[k] = v.to_pydatetime()
        out[name] = spark.createDataFrame(rows, schema=schema_of[name])
    return out
