"""Conditional MERGE builder over :class:`TxTable` — the Delta Lake
``DeltaTable.merge`` API surface (public docs: `MERGE INTO` with
``WHEN MATCHED [AND cond] THEN UPDATE/DELETE``, ``WHEN NOT MATCHED
[AND cond] THEN INSERT``, ``WHEN NOT MATCHED BY SOURCE [AND cond]
THEN UPDATE/DELETE``), re-expressed on the partition-pruned key merge
of operators/txlog.py.

The reference repo has no transactional table; this module exists for
API parity with the public lakehouse MERGE shape that a 100 TB crawl
pipeline needs for dimension upkeep (SCD upserts, tombstone
propagation, reconciliation deletes).

Semantics (Delta parity, documented deviations below):

- Clauses within a group cascade FIRST-TRUE-WINS, and only the last
  clause of a group may omit its condition (a later clause would be
  unreachable).
- A source with duplicate keys is refused ("multiple source rows
  matched" — the cascade result would depend on join multiplicity).
  A TARGET with duplicate keys is fine: rows of a key that any clause
  touched are replaced as a group, with the untouched siblings passed
  through byte-identical (the key-replacement rewrite is per KEY, so
  the passthrough is what keeps per-row clause results exact).
- Conditions and assignment expressions are SQL strings (or Columns)
  over the aliases ``s`` (source) and ``t`` (target); matched clauses
  may reference both, insert clauses only ``s``, not-matched-by-source
  clauses only ``t``. A condition evaluating to NULL does not match.
- Assignments that would not cast to the column type raise instead of
  silently writing NULL, and every condition/assignment must be
  deterministic — same rules (and same guards) as
  ``TxTable.update_where``. Assigning a key or partition column is
  refused (delete + insert instead).
- DEVIATION from Delta: the join is on an explicit key-column list,
  not an arbitrary ON condition, and NULL keys match null-safely
  (one more key value) — consistent with ``merge_into``, whose
  partition pruning and stats-pruned containment guard this builder
  inherits. Delta's SQL-equality ON never matches NULL keys.

Scale shape: matched and not-matched classification reads ONLY the
files whose per-file key stats intersect the source's key bounds
(``_containment_candidates`` — files provably disjoint from every
source key hold no matched row, so they can't affect either side of
the classification). The full-table scan happens ONLY when a
``when_not_matched_by_source`` clause exists, exactly as in Delta
(those clauses are defined over the table's complement). The rewrite
itself is ``merge_into``'s: touched partitions only, with the
lost-update window closed by ``expected_version`` (the table advancing
between this builder's snapshot and the commit conflicts loudly).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .txlog import (
    TxError,
    _assert_deterministic,
    _null_safe_key_cond,
)

#: Internal cascade column; stripped before any row reaches the table.
_M = "__merge_clause"


def _as_col(e):
    return F.expr(e) if isinstance(e, str) else e


def _union(parts: list):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class _Clause:
    __slots__ = ("kind", "condition", "assignments")

    def __init__(self, kind, condition, assignments=None):
        self.kind = kind
        self.condition = condition
        self.assignments = assignments


class MergeBuilder:
    """Build and execute one conditional MERGE. Obtain via
    ``TxTable.merge(source, key)``; every ``when_*`` method returns
    ``self`` for chaining; ``execute()`` commits atomically and
    returns the new version (or the current one for a no-op)."""

    def __init__(self, table, source, key,
                 check_key_containment: bool = True):
        self._t = table
        self._source = source
        self._key = list(key)
        self._check = check_key_containment
        self._matched: list[_Clause] = []
        self._not_matched: list[_Clause] = []
        self._nmbs: list[_Clause] = []
        self._evolve = False

    def with_schema_evolution(self):
        """Admit source columns the target lacks (Delta's
        ``withSchemaEvolution``): the commit widens the table schema,
        existing rows null-fill the new columns, clause assignments
        and insertAll may reference/populate them."""
        self._evolve = True
        return self

    # ------------------------------------------------- clause builders
    def _add(self, group: list, name: str, clause: _Clause):
        if group and group[-1].condition is None:
            raise TxError(
                f"merge: only the last {name} clause may omit its "
                "condition — clauses cascade first-true-wins, so one "
                "after an unconditional clause is unreachable"
            )
        group.append(clause)
        return self

    def when_matched_update(self, set: dict, condition=None):
        """Matched rows satisfying ``condition`` get ``set`` applied
        (column -> expression over ``s``/``t``, evaluated against the
        pre-image row like SQL UPDATE)."""
        if not set:
            raise TxError("merge: when_matched_update needs assignments")
        return self._add(self._matched, "when_matched",
                         _Clause("update", condition, dict(set)))

    def when_matched_delete(self, condition=None):
        """Matched rows satisfying ``condition`` leave the table."""
        return self._add(self._matched, "when_matched",
                         _Clause("delete", condition))

    def when_not_matched_insert(self, values: dict | None = None,
                                condition=None):
        """Source rows with no matching target key insert. ``values``
        maps target columns to expressions over ``s``; omitted columns
        are NULL. ``values=None`` inserts the source columns by name
        (missing target columns NULL) — Delta's ``insertAll``. Source
        columns the target lacks are ignored unless
        ``with_schema_evolution()`` widened the table."""
        return self._add(self._not_matched, "when_not_matched",
                         _Clause("insert", condition,
                                 dict(values) if values else None))

    def when_not_matched_by_source_update(self, set: dict,
                                          condition=None):
        """Target rows whose key has NO source row get ``set`` applied
        (expressions over ``t`` only) — e.g. mark-stale."""
        if not set:
            raise TxError(
                "merge: when_not_matched_by_source_update needs "
                "assignments"
            )
        return self._add(self._nmbs, "when_not_matched_by_source",
                         _Clause("update", condition, dict(set)))

    def when_not_matched_by_source_delete(self, condition=None):
        """Target rows whose key has NO source row leave the table —
        the full-reconciliation form."""
        return self._add(self._nmbs, "when_not_matched_by_source",
                         _Clause("delete", condition))

    # ------------------------------------------------------- execution
    def execute(self, txn: str | None = None) -> int:
        from pyspark import StorageLevel

        t = self._t
        if not (self._matched or self._not_matched or self._nmbs):
            raise TxError("merge: no WHEN clauses")
        if txn is not None and t.seen_txn(txn):
            return t.latest_version()  # idempotent replay: no-op
        missing = [k for k in self._key
                   if k not in self._source.columns]
        if missing:
            raise TxError(f"merge: source lacks key columns {missing}")
        src = self._source.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._execute_cached(src, txn)
        finally:
            src.unpersist()

    def _execute_cached(self, src, txn) -> int:
        t, key = self._t, self._key
        version = t.latest_version()
        snap = t._snapshot(version)
        schema = t._declared_schema(snap)
        if self._evolve:
            from pyspark.sql.types import StructType

            have = {f.name for f in schema.fields}
            extra = [f for f in src.schema.fields if f.name not in have]
            if extra:
                # evolved classification reads: existing files
                # null-fill, so fallbacks and insert defaults resolve
                schema = StructType(list(schema.fields) + extra)
        names = [f.name for f in schema.fields]
        types = {f.name: f.dataType for f in schema.fields}
        pcols = snap["metaData"]["partitionColumns"]
        self._validate_assignments(
            names, pcols, t._generated(snap["metaData"])
        )
        adds = list(snap["adds"].values())
        # classification scan: stats-pruned to the files that MAY hold a
        # source key, unless a BY SOURCE clause needs the complement too
        if self._nmbs:
            base = adds
        elif adds:
            base = t._containment_candidates(adds, src.select(*key), key)
        else:
            base = []
        cur = (
            t._read_adds(base, schema) if base
            else t.spark.createDataFrame([], schema)
        )
        # Fused classification (r14, guide §1.2/§2.4): ONE bounded agg
        # over a single full-outer target⋈source frame replaces the
        # dup-source-key guard job plus the one precheck agg PER clause
        # group — the classification scan of the table runs once instead
        # of once per group (a 4-clause merge ran it three times). The
        # agg yields the dup-key verdict, each group's affected-row
        # count and every assignment's cast-to-NULL check in one pass;
        # the rewrite frames below keep their original per-group shapes
        # (merge_into consumes them, and they only build for groups the
        # fused pass proved non-empty).
        ns = self._fused_precheck(cur, src, key, names, types)
        total = sum(ns.values())
        if total == 0:
            return version  # nothing matched any clause: no commit
        upd_parts, del_parts = [], []

        if ns["matched"]:
            tgt_m, s_m = cur.alias("t"), src.alias("s")
            j = tgt_m.join(
                s_m, _null_safe_key_cond(tgt_m, s_m, key), "inner"
            )
            out, pre = self._cascade(
                j, self._matched, names, types,
                fallback=lambda c: tgt_m[c],
            )
            if out is not None:
                upd_parts.append(out)
            if pre is not None:
                del_parts.append(pre)

        if ns["insert"]:
            s_i = src.alias("s")
            tkeys = cur.select(*key).distinct()
            nm = s_i.join(
                tkeys, _null_safe_key_cond(s_i, tkeys, key), "left_anti"
            )
            upd_parts.append(self._cascade_insert(nm, src, names, types))

        if ns["nmbs"]:
            tgt_b = cur.alias("t")
            skeys = src.select(*key).distinct()
            nmb = tgt_b.join(
                skeys, _null_safe_key_cond(tgt_b, skeys, key),
                "left_anti",
            )
            out, pre = self._cascade(
                nmb, self._nmbs, names, types,
                fallback=lambda c: tgt_b[c],
            )
            if out is not None:
                upd_parts.append(out)
            if pre is not None:
                del_parts.append(pre)
        updates = (
            _union(upd_parts)
            if upd_parts else t.spark.createDataFrame([], schema)
        )
        deletes = _union(del_parts) if del_parts else None
        return t.merge_into(
            updates, key,
            check_key_containment=self._check,
            txn=txn,
            deletes=deletes,
            expected_version=version,
            merge_schema=self._evolve,
        )

    # ------------------------------------------------------- internals
    def _validate_assignments(self, names: list, pcols: list,
                              gen: dict):
        known = set(names)
        frozen = (
            {c: "generated" for c in gen}
            | {c: "key" for c in self._key}
            | {c: "partition" for c in pcols}
        )
        for group, label in ((self._matched, "when_matched"),
                             (self._nmbs,
                              "when_not_matched_by_source")):
            for cl in group:
                if cl.kind != "update":
                    continue
                unknown = sorted(set(cl.assignments) - known)
                if unknown:
                    raise TxError(
                        f"merge: {label}_update assigns unknown "
                        f"columns {unknown}"
                    )
                bad = sorted(set(cl.assignments) & set(frozen))
                if bad:
                    kinds = "/".join(
                        sorted({frozen[c] for c in bad})
                    )
                    raise TxError(
                        f"merge: {label}_update assigns {kinds} "
                        f"columns {bad} — key/partition columns would "
                        "need a global row move (delete + insert "
                        "instead); generated columns derive from their "
                        "expressions (update the base columns)"
                    )
        for cl in self._not_matched:
            if cl.assignments:
                unknown = sorted(set(cl.assignments) - known)
                if unknown:
                    raise TxError(
                        "merge: when_not_matched_insert assigns "
                        f"unknown columns {unknown}"
                    )

    def _clause_index_col(self, clauses, guard):
        """The first-true-wins clause index as a COLUMN, each branch
        gated on ``guard`` (the group's side-presence predicate in the
        fused classification frame — a matched clause's condition must
        never fire on a row whose target side is absent, even when the
        null-extended columns would make it evaluate true)."""
        w = None
        for i, cl in enumerate(clauses):
            c = (F.lit(True) if cl.condition is None
                 else _as_col(cl.condition).cast("boolean"))
            c = guard & c
            w = F.when(c, F.lit(i)) if w is None else w.when(c, F.lit(i))
        return w

    def _clause_index(self, frame, clauses):
        return frame.withColumn(
            _M, self._clause_index_col(clauses, F.lit(True))
        )

    def _group_vals(self, clauses, src, names, insert=False):
        """clause index -> {column -> value Column} for a clause group
        (``insert``: ``None`` assignments mean insertAll — source
        columns by name, missing target columns NULL)."""
        vals = {}
        for i, cl in enumerate(clauses):
            if insert:
                if cl.assignments is not None:
                    vals[i] = {
                        c: _as_col(e) for c, e in cl.assignments.items()
                    }
                else:
                    vals[i] = {
                        c: src[c] for c in names if c in src.columns
                    }
            elif cl.kind == "update":
                vals[i] = {
                    c: _as_col(e) for c, e in cl.assignments.items()
                }
        return vals

    def _fused_precheck(self, cur, src, key, names, types):
        """One bounded agg over a full-outer target⋈source frame: the
        Delta "multiple source rows matched" refusal, every clause
        group's affected-row count, and per-assignment cast-to-NULL
        detection (ANSI semantics — a value the column type can't hold
        is an error, not a silent NULL). Also the determinism gate for
        every condition and assignment (the frames feed multiple
        passes: this agg, the output selects, and merge_into's
        probe/guard/rewrite). Returns {"matched"/"insert"/"nmbs": n}.

        Row multiplicities match the per-group frames exactly: a
        matched (t,s) pair appears once per target row (source keys are
        unique past the dup gate), an unmatched source row exactly once
        with the target side null, an unmatched target row exactly once
        with the source side null — so the guarded counts equal the
        old per-group precheck counts. GROUP BY treated NULL keys as
        one group in the old dup check; the window count and the
        null-safe join keep that convention."""
        from pyspark.sql import Window

        tgt_f = cur.withColumn("__t_present", F.lit(True)).alias("t")
        src_f = (
            src.withColumn(
                "__s_dup",
                F.count(F.lit(1)).over(
                    Window.partitionBy(*[F.col(k) for k in key])
                ),
            )
            .withColumn("__s_present", F.lit(True))
            .alias("s")
        )
        work = tgt_f.join(
            src_f, _null_safe_key_cond(tgt_f, src_f, key), "full_outer"
        )
        t_here = tgt_f["__t_present"].isNotNull()
        s_here = src_f["__s_present"].isNotNull()
        specs = []  # (group, op label, idx col name, checks)
        for group, label, clauses, guard, insert in (
            ("matched", "merge(when_matched)", self._matched,
             t_here & s_here, False),
            ("insert", "merge(when_not_matched)", self._not_matched,
             s_here & ~t_here, True),
            ("nmbs", "merge(when_not_matched_by_source)", self._nmbs,
             t_here & ~s_here, False),
        ):
            if not clauses:
                continue
            idx = f"__m_{group}"
            work = work.withColumn(
                idx, self._clause_index_col(clauses, guard)
            )
            vals = self._group_vals(clauses, src_f, names, insert=insert)
            checks = [
                (i, c, v) for i, m in vals.items() for c, v in m.items()
            ]
            _assert_deterministic(
                work.select(F.col(idx), *(v for _, _, v in checks)),
                label,
                "clause expression — classification, the cast "
                "pre-flight and the rewrite would each evaluate it "
                "against a different row set",
            )
            specs.append((group, label, idx, checks))
        aggs = [F.max(F.col("__s_dup")).alias("__dup")]
        for group, label, idx, checks in specs:
            aggs.append(
                F.sum(F.col(idx).isNotNull().cast("long")).alias(
                    f"__n_{group}"
                )
            )
            for j, (i, c, v) in enumerate(checks):
                bad = (
                    (F.col(idx) == i)
                    & v.isNotNull()
                    & v.try_cast(types[c]).isNull()
                )
                aggs.append(
                    F.sum(bad.cast("long")).alias(f"__bad_{group}_{j}")
                )
        row = work.agg(*aggs).collect()[0]
        # Delta's "multiple source rows matched" refusal: with dup keys
        # the cascade result depends on join multiplicity. Checked
        # FIRST — the clause counts/casts below are meaningless on an
        # ambiguous source.
        if (row["__dup"] or 0) > 1:
            raise TxError(
                "merge: multiple source rows share a key — deduplicate "
                "the source first (clause results would be ambiguous)"
            )
        ns = {"matched": 0, "insert": 0, "nmbs": 0}
        for group, label, idx, checks in specs:
            bad_cols = sorted({
                c for j, (i, c, v) in enumerate(checks)
                if row[f"__bad_{group}_{j}"]
            })
            if bad_cols:
                raise TxError(
                    f"{label}: assignment to {bad_cols} does not cast "
                    "to the column type (would silently become NULL) — "
                    "fix the expression or cast it explicitly"
                )
            ns[group] = row[f"__n_{group}"] or 0
        return ns

    def _cascade(self, frame, clauses, names, types, fallback):
        """First-true-wins cascade for update/delete clause groups.
        Returns (update_rows, delete_preimages). Rows where no clause
        matched but whose KEY was touched by some sibling row pass
        through into the updates frame byte-identical — the
        key-replacement rewrite replaces per key, so without the
        passthrough a duplicate-key target would silently drop the
        untouched siblings. Only called for groups the fused precheck
        proved non-empty (and already determinism- and cast-gated)."""
        f = self._clause_index(frame, clauses)
        upd_idx = [i for i, cl in enumerate(clauses)
                   if cl.kind == "update"]
        del_idx = [i for i, cl in enumerate(clauses)
                   if cl.kind == "delete"]
        vals = {
            i: {c: _as_col(e) for c, e in cl.assignments.items()}
            for i, cl in enumerate(clauses) if cl.kind == "update"
        }
        out = None
        if upd_idx:
            cols = []
            for c in names:
                expr = None
                for i in upd_idx:
                    if c in vals[i]:
                        v = vals[i][c].try_cast(types[c])
                        expr = (
                            F.when(F.col(_M) == i, v) if expr is None
                            else expr.when(F.col(_M) == i, v)
                        )
                cols.append(
                    (expr.otherwise(fallback(c)) if expr is not None
                     else fallback(c)).alias(c)
                )
            out = f.filter(F.col(_M).isin(upd_idx)).select(*cols)
        pre = None
        if del_idx:
            pre = f.filter(F.col(_M).isin(del_idx)).select(
                *(fallback(c).alias(c) for c in names)
            )
        # duplicate-key-target passthrough: untouched rows sharing a
        # key with any clause-touched row ride along as identity
        # updates (empty for the common key-unique target — the
        # semi-join probe side is the touched keys, bounded by the
        # source size)
        touched = [x for x in (out, pre) if x is not None]
        akeys = _union([p.select(*self._key) for p in touched]).distinct()
        untouched = f.filter(F.col(_M).isNull()).select(
            *(fallback(c).alias(c) for c in names)
        )
        ident = untouched.join(
            akeys, _null_safe_key_cond(untouched, akeys, self._key),
            "left_semi",
        )
        out = out.unionByName(ident) if out is not None else ident
        return out, pre

    def _cascade_insert(self, nm, src, names, types):
        """First-true-wins cascade for the insert clause group over the
        not-matched source rows. Returns the insert rows; only called
        when the fused precheck proved the group non-empty."""
        clauses = self._not_matched
        f = self._clause_index(nm, clauses)
        vals = self._group_vals(clauses, src, names, insert=True)
        cols = []
        for c in names:
            expr = None
            for i in vals:
                v = vals[i].get(c)
                v = (F.lit(None) if v is None else v).try_cast(types[c])
                expr = (
                    F.when(F.col(_M) == i, v) if expr is None
                    else expr.when(F.col(_M) == i, v)
                )
            cols.append(
                expr.otherwise(F.lit(None).cast(types[c])).alias(c)
            )
        return f.filter(F.col(_M).isNotNull()).select(*cols)
