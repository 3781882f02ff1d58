"""Pure-Python oracle: literal interpretation of the reference's
correction-lookup semantics, used as the gold standard for the
P/R >= 0.95 parity tests (never on the Spark executors).

Each ``find_*`` function transcribes one SPARQL lookup query from
`corhist/.../dataset/queries/*QueriesBuilder.java`; expansion and the
still-applied filter transcribe
`corhist/.../dataset/ConstraintViolationCorrectionLookup.java:101-222`.

Known ambiguity, resolved symmetrically here AND in the Spark pipeline:
the reference's expand-from-addition query filters
``NOT EXISTS { GRAPH ?additions { target } }`` with ``?additions``
unbound (`...Lookup.java:152-165` — a likely copy-paste slip).  We read
it as the intended mirror of the from-deletion query: a candidate
revision is skipped if its *deletions* touched the target triple.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass

from . import schemas as S

INF = float("inf")
LONG_MAX = (1 << 63) - 1


@dataclass(frozen=True)
class Correction:
    constraint_id: str
    corr_rev: int
    target_subj: str
    target_pred: str
    target_obj: str
    correction: frozenset  # of (subj, pred, obj, op)


class History:
    """In-memory index over (revisions, edits) fixture rows."""

    def __init__(self, revisions: list[dict], edits: list[dict]):
        self.rev = {r["rev_id"]: r for r in revisions}
        self.adds: dict[int, list] = defaultdict(list)
        self.dels: dict[int, list] = defaultdict(list)
        self.events: dict[tuple, list] = defaultdict(list)  # (s,p,o) -> [(rev, op)]
        self.preds: dict[str, set] = defaultdict(set)  # p -> {(s, o)}
        for e in sorted(edits, key=lambda x: (x["rev_id"], 0 if x["op"] == "del" else 1)):
            t = (e["subj"], e["pred"], e["obj"])
            (self.adds if e["op"] == "add" else self.dels)[e["rev_id"]].append(t)
            self.events[t].append((e["rev_id"], e["op"]))
            self.preds[e["pred"]].add((e["subj"], e["obj"]))
        self.basedon_fwd: dict[int, list] = defaultdict(list)
        self.basedon_rev: dict[int, list] = defaultdict(list)
        for r in revisions:
            b = r.get("based_on_rev_id")
            if b is not None and not (isinstance(b, float) and b != b):
                b = int(b)
                self.basedon_fwd[r["rev_id"]].append(b)
                self.basedon_rev[b].append(r["rev_id"])

    # -- revision metadata -------------------------------------------------
    def parent(self, rev_id: int):
        p = self.rev[rev_id]["parent_rev_id"]
        if p is None or (isinstance(p, float) and p != p):
            return None
        return int(p)

    def author(self, rev_id: int) -> str:
        return self.rev[rev_id]["author"]

    def basedon_neighbors(self, rev_id: int) -> list[int]:
        return self.basedon_fwd.get(rev_id, []) + self.basedon_rev.get(rev_id, [])

    # -- state-at-revision -------------------------------------------------
    def visible(self, t: tuple, g) -> bool:
        last = None
        for rev, op in self.events.get(t, ()):
            if rev <= g:
                last = op
            else:
                break
        return last == "add"

    def pred_pairs(self, p: str, g):
        for s, o in self.preds.get(p, ()):
            if self.visible((s, p, o), g):
                yield s, o

    def objects(self, s: str, p: str, g):
        return [o for s2, o in self.preds.get(p, ()) if s2 == s and self.visible((s, p, o), g)]

    def subjects(self, p: str, o: str, g):
        return [s for s, o2 in self.preds.get(p, ()) if o2 == o and self.visible((s, p, o), g)]

    def reaches(self, start: str, targets: set, g) -> bool:
        """start P279* t for some t in targets, within state g (reflexive)."""
        seen, todo = set(), [start]
        while todo:
            x = todo.pop()
            if x in seen:
                continue
            seen.add(x)
            if x in targets:
                return True
            todo.extend(self.objects(x, S.SUBCLASS_OF, g))
        return False

    def closure_sources(self, targets: set, g) -> set:
        """{t : t P279* o2 in g, o2 in targets} (reflexive)."""
        out = set(t for t in targets)
        # reverse-BFS over P279 edges visible at g
        changed = True
        edges = [(s, o) for s, o in self.preds.get(S.SUBCLASS_OF, ()) if self.visible((s, S.SUBCLASS_OF, o), g)]
        while changed:
            changed = False
            for s, o in edges:
                if o in out and s not in out:
                    out.add(s)
                    changed = True
        return out


def relation_preds(constraint: dict) -> list[str]:
    """`AbstractQueriesBuilder.convertRelationParameter` — defaults to
    instance-of when the parameter is absent."""
    rels = constraint["params"].get(S.PARAM_RELATION) or [S.REL_INSTANCE]
    r = rels[0]
    if r == S.REL_INSTANCE:
        return [S.INSTANCE_OF]
    if r == S.REL_SUBCLASS:
        return [S.SUBCLASS_OF]
    if r == S.REL_INSTANCE_OR_SUBCLASS:
        return [S.INSTANCE_OF, S.SUBCLASS_OF]
    raise ValueError(f"unsupported relation {r}")


def format_regex(constraint: dict) -> str:
    """`FormatQueriesBuilder.convertRegexParameter:55-74`."""
    for rx in constraint["params"].get(S.PARAM_REGEX, []):
        anchored = "^" + rx + "$"
        try:
            re.compile(anchored)
            return anchored
        except re.error:
            continue
    return "^.*$"


def sameas_guard(h: History, rev_id: int, s: str) -> bool:
    """True when the revision also added `s sameAs ?` (redirect)."""
    return any(t[0] == s and t[1] == S.SAME_AS for t in h.adds[rev_id])


def find_corrections(h: History, constraint: dict) -> list[Correction]:
    ctype = constraint["type"]
    fn = {
        S.TYPE_SINGLE: _single,
        S.TYPE_UNIQUE: _unique,
        S.TYPE_INVERSE: _inverse,
        S.TYPE_SYMMETRIC: _inverse,
        S.TYPE_TYPE: _type,
        S.TYPE_VALUE_TYPE: _value_type,
        S.TYPE_TARGET_CLAIM: _target_claim,
        S.TYPE_ITEM: _item,
        S.TYPE_CONFLICT: _conflict,
        S.TYPE_ONE_OF: _one_of,
        S.TYPE_FORMAT: _format,
    }.get(ctype)
    if fn is None:
        return []
    rows = _distinct(fn(h, constraint))
    out = []
    for row in rows:
        out.append(_build_correction(h, constraint, row))
    return [c for c in out if _still_applied(h, c)]


def _distinct(rows):
    seen, out = set(), []
    for r in rows:
        k = tuple(sorted(r.items()))
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


# Each row dict: target_s, target_o, is_add, corr_s, corr_p(optional),
# corr_o, corr_rev — mirroring the SELECT projections.


def _del_candidates(h: History, prop: str, need_prev: bool = True):
    """Iterate (rev_id, s, o, g) for deletions of `s prop o` where the
    revision has a previous revision (required by the
    `#previousRevision/#globalState` path)."""
    for rev_id, triples in h.dels.items():
        prev = h.parent(rev_id)
        if need_prev and prev is None:
            continue
        g = prev if prev is not None else None
        for s, p, o in triples:
            if p == prop:
                yield rev_id, s, o, g


def _single(h, c):
    prop = c["property"]
    for rev_id, s, o, g in _del_candidates(h, prop):
        for o2 in h.objects(s, prop, g):
            if o2 == o:
                continue
            if (s, prop, o2) in [t for t in h.dels[rev_id]]:
                continue
            base = dict(is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
            yield dict(base, target_s=s, target_o=o)
            yield dict(base, target_s=s, target_o=o2)


def _unique(h, c):
    prop = c["property"]
    for rev_id, s, o, g in _del_candidates(h, prop):
        if sameas_guard(h, rev_id, s):
            continue
        for s2 in h.subjects(prop, o, g):
            if s2 == s:
                continue
            base = dict(is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
            yield dict(base, target_s=s, target_o=o)
            yield dict(base, target_s=s2, target_o=o)


def _inverse(h, c):
    prop = c["property"]
    inv = prop if c["type"] == S.TYPE_SYMMETRIC else c["params"][S.PARAM_PROPERTY][0]
    # deletion branch: s prop o deleted while inverse was missing
    for rev_id, s, o, g in _del_candidates(h, prop):
        if sameas_guard(h, rev_id, s):
            continue
        if h.visible((o, inv, s), g):
            continue
        yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
    # addition branch: o inv s added while s prop o was in prev state
    for rev_id, triples in h.adds.items():
        g = h.parent(rev_id)
        if g is None:
            continue
        for o, p, s in triples:
            if p != inv:
                continue
            if h.visible((s, prop, o), g):
                yield dict(
                    target_s=s, target_o=o, is_add=True,
                    corr_s=o, corr_p=inv, corr_o=s, corr_rev=rev_id,
                )


def _type_like(h, c, on_object: bool):
    """Type (`TypeQueriesBuilder`) / valueType (`ValueTypeQueriesBuilder`)."""
    prop = c["property"]
    rels = relation_preds(c)
    classes = set(c["params"].get(S.PARAM_CLASS, []))
    # deletion branch.  Empty class parameter: the SPARQL filter
    # degenerates to NOT EXISTS { ?s rel/P279* ?o2 } with ?o2 free —
    # any typing edge counts as evidence.
    for rev_id, s, o, g in _del_candidates(h, prop):
        if sameas_guard(h, rev_id, s):
            continue
        carrier = o if on_object else s
        ok = any(
            (not classes) or h.reaches(t, classes, g)
            for rel in rels
            for t in h.objects(carrier, rel, g)
        )
        if ok:
            continue  # NOT EXISTS fails -> not a violation fix
        yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
    if not classes:
        # the addition branch's current-state subquery degenerates with
        # an empty class list; not supported (mirrors kernels._type_like)
        return
    # addition branch: carrier rel type added, type in closure of classes
    cur_types = h.closure_sources(classes, LONG_MAX)
    for rev_id, triples in h.adds.items():
        g = h.parent(rev_id)
        if g is None:
            continue
        for carrier, p, typ in triples:
            if p not in rels or typ not in cur_types:
                continue
            # the added carrier->type edge plus prev-state evidence
            if not h.reaches(typ, classes, g):
                continue
            if on_object:
                pairs = [(s, carrier) for s in h.subjects(prop, carrier, g)]
            else:
                pairs = [(carrier, o) for o in h.objects(carrier, prop, g)]
            for s, o in pairs:
                if (s, prop, o) in h.dels[rev_id]:
                    continue
                # ?corrP from `GRAPH ?add { ?carrier ?corrP ?type }`
                for s3, p3, o3 in h.adds[rev_id]:
                    if s3 == carrier and o3 == typ:
                        yield dict(
                            target_s=s, target_o=o, is_add=True,
                            corr_s=carrier, corr_p=p3, corr_o=typ, corr_rev=rev_id,
                        )


def _type(h, c):
    yield from _type_like(h, c, on_object=False)


def _value_type(h, c):
    yield from _type_like(h, c, on_object=True)


def _claim_like(h, c, on_object: bool):
    """targetClaim (`TargetRequiredClaimQueriesBuilder`) / item
    (`ItemQueriesBuilder`): carrier must hold `p2 o2` (o2 optionally
    restricted to the item parameter)."""
    prop = c["property"]
    p2 = c["params"][S.PARAM_PROPERTY][0]
    items = c["params"].get(S.PARAM_ITEM) or None
    for rev_id, s, o, g in _del_candidates(h, prop):
        if sameas_guard(h, rev_id, s):
            continue
        carrier = o if on_object else s
        o2s = [o2 for o2 in h.objects(carrier, p2, g) if items is None or o2 in items]
        if o2s:
            continue
        yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
    # addition branch: carrier p2 o2 added while s prop o in prev state
    for rev_id, triples in h.adds.items():
        g = h.parent(rev_id)
        if g is None:
            continue
        for carrier, p, o2 in triples:
            if p != p2 or (items is not None and o2 not in items):
                continue
            if on_object:
                pairs = [(s, carrier) for s in h.subjects(prop, carrier, g)]
            else:
                pairs = [(carrier, o) for o in h.objects(carrier, prop, g)]
            for s, o in pairs:
                yield dict(
                    target_s=s, target_o=o, is_add=True,
                    corr_s=carrier, corr_p=p2, corr_o=o2, corr_rev=rev_id,
                )


def _target_claim(h, c):
    yield from _claim_like(h, c, on_object=True)


def _item(h, c):
    yield from _claim_like(h, c, on_object=False)


def _conflict(h, c):
    prop = c["property"]
    p2 = c["params"][S.PARAM_PROPERTY][0]
    items = c["params"].get(S.PARAM_ITEM) or None
    # branch a: delete s prop o while conflicting s p2 o2 in prev state
    for rev_id, s, o, g in _del_candidates(h, prop):
        o2s = [
            o2
            for o2 in h.objects(s, p2, g)
            if (items is None or o2 in items) and (s, p2, o2) not in h.dels[rev_id]
        ]
        if o2s:
            yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)
    # branch b: delete the conflicting s p2 o2 while s prop o in prev state
    for rev_id, s, o2, g in _del_candidates(h, p2):
        if items is not None and o2 not in items:
            continue
        for o in h.objects(s, prop, g):
            if (s, prop, o) in h.dels[rev_id]:
                continue
            yield dict(
                target_s=s, target_o=o, is_add=False,
                corr_s=s, corr_p=p2, corr_o=o2, corr_rev=rev_id,
            )


def _one_of(h, c):
    prop = c["property"]
    items = c["params"].get(S.PARAM_ITEM)
    if not items:
        return  # empty VALUES group: NOT EXISTS {} always fails
    # note: no prev-state join in this builder (`OneOfQueriesBuilder:31-37`)
    for rev_id, triples in h.dels.items():
        for s, p, o in triples:
            if p != prop or o in items:
                continue
            if sameas_guard(h, rev_id, s):
                continue
            yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)


def _format(h, c):
    prop = c["property"]
    rx = re.compile(format_regex(c))
    for rev_id, triples in h.dels.items():
        for s, p, o in triples:
            if p != prop or rx.search(o):
                continue
            if sameas_guard(h, rev_id, s):
                continue
            yield dict(target_s=s, target_o=o, is_add=False, corr_s=s, corr_o=o, corr_rev=rev_id)


# --- expansion + still-applied (`...Lookup.java:101-222`) ----------------


def _build_correction(h: History, constraint: dict, row: dict) -> Correction:
    prop = constraint["property"]
    main = (
        row["corr_s"],
        row.get("corr_p", prop),
        row["corr_o"],
        "add" if row["is_add"] else "del",
    )
    target = (row["target_s"], prop, row["target_o"])
    stmts, corr_rev = _expand(h, main, target, row["corr_rev"])
    return Correction(
        constraint["constraint_id"], corr_rev, target[0], target[1], target[2],
        frozenset(stmts),
    )


def _expand(h: History, main: tuple, target: tuple, main_rev: int):
    is_del_main = main[3] == "del"
    author = h.author(main_rev)
    cands = [(main_rev, 0)] + [
        (r2, 1) for r2 in h.basedon_neighbors(main_rev) if h.author(r2) == author
    ]
    best_dist, best_rev, triples = INF, LONG_MAX, set()
    for r2, dist in cands:
        graph = h.adds[r2] if is_del_main else h.dels[r2]
        guard = h.adds[r2] if is_del_main else h.dels[r2]
        if target in guard:
            continue
        op = "add" if is_del_main else "del"
        for s2, p2, o2 in graph:
            if s2 == main[0] and (p2 == main[1] or o2 == main[2]):
                if dist < best_dist:
                    triples, best_dist, best_rev = set(), dist, LONG_MAX
                if dist == best_dist:
                    best_rev = min(best_rev, r2)
                    triples.add((s2, p2, o2, op))
    correction = set() if len(triples) > 1 else set(triples)
    correction.add(main)
    return correction, min(main_rev, best_rev if best_rev != LONG_MAX else LONG_MAX)


def _still_applied(h: History, c: Correction) -> bool:
    for s, p, o, op in c.correction:
        vis = h.visible((s, p, o), LONG_MAX)
        if op == "add" and not vis:
            return False
        if op == "del" and vis:
            return False
    return True


# --- violation queries over a state snapshot -----------------------------


def find_violations(h: History, constraint: dict, g=LONG_MAX) -> set:
    """Transcribes `buildViolationQuery` per type: (target_s, target_o)."""
    ctype, prop = constraint["type"], constraint["property"]
    out = set()
    if ctype == S.TYPE_SINGLE:
        for s, o in h.pred_pairs(prop, g):
            if any(o2 != o for o2 in h.objects(s, prop, g)):
                out.add((s, o))
    elif ctype == S.TYPE_UNIQUE:
        for s, o in h.pred_pairs(prop, g):
            if any(s2 != s for s2 in h.subjects(prop, o, g)):
                out.add((s, o))
    elif ctype in (S.TYPE_INVERSE, S.TYPE_SYMMETRIC):
        inv = prop if ctype == S.TYPE_SYMMETRIC else constraint["params"][S.PARAM_PROPERTY][0]
        for s, o in h.pred_pairs(prop, g):
            if not h.visible((o, inv, s), g):
                out.add((s, o))
    elif ctype in (S.TYPE_TYPE, S.TYPE_VALUE_TYPE):
        rels = relation_preds(constraint)
        classes = set(constraint["params"].get(S.PARAM_CLASS, []))
        for s, o in h.pred_pairs(prop, g):
            carrier = o if ctype == S.TYPE_VALUE_TYPE else s
            ok = classes and any(
                h.reaches(t, classes, g) for rel in rels for t in h.objects(carrier, rel, g)
            )
            if not ok:
                out.add((s, o))
    elif ctype in (S.TYPE_TARGET_CLAIM, S.TYPE_ITEM):
        p2 = constraint["params"][S.PARAM_PROPERTY][0]
        items = constraint["params"].get(S.PARAM_ITEM) or None
        for s, o in h.pred_pairs(prop, g):
            carrier = o if ctype == S.TYPE_TARGET_CLAIM else s
            if not any(items is None or o2 in items for o2 in h.objects(carrier, p2, g)):
                out.add((s, o))
    elif ctype == S.TYPE_CONFLICT:
        p2 = constraint["params"][S.PARAM_PROPERTY][0]
        items = constraint["params"].get(S.PARAM_ITEM) or None
        for s, o in h.pred_pairs(prop, g):
            if any(items is None or o2 in items for o2 in h.objects(s, p2, g)):
                out.add((s, o))
    elif ctype == S.TYPE_ONE_OF:
        items = constraint["params"].get(S.PARAM_ITEM)
        if items:
            for s, o in h.pred_pairs(prop, g):
                if o not in items:
                    out.add((s, o))
    elif ctype == S.TYPE_FORMAT:
        rx = re.compile(format_regex(constraint))
        for s, o in h.pred_pairs(prop, g):
            if not rx.search(o):
                out.add((s, o))
    return out
