"""Parquet-backed record warehouse with the reference's write-side
semantics re-expressed as deterministic batch jobs (SURVEY §3.2).

Layout under ``root``::

    bibs/ auths/            nested records, partitioned by pt = _id % N
    bib_history/ auth_history/   append-only version log
    merge_log/               auth merge audit rows

Per-commit pipeline (replacing the reference's per-record round-trips
and 4 thread families, dlx/marc/__init__.py:856-1234):

1. id assignment — ``max(_id over live ∪ history) + row_number`` instead
   of a shared mutable counter (single-writer batch assumption,
   documented like the reference's counter consistency check);
2. validation + auth validation against the broadcast-sized AuthIndex;
3. audit stamps — ``created`` preserved from the previous version;
4. derived columns (text/words, logical fields) recomputed for the
   touched records as one DataFrame job;
5. history append — the full new doc becomes the next version;
6. bucketed upsert — only the partitions containing touched ids are
   rewritten (dynamic partition overwrite).  At 100 TB this slots in a
   Delta/Iceberg MERGE INTO without changing the call sites;
7. heading-change propagation — attached records are recommitted as one
   follow-up batch (cached linked values refresh; feedback-loop guarded
   by ``update_attached=False`` on the recursive call, mirroring the
   reference's guard at 1162-1165).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from dlx_spark import config, fsio, schemas
from dlx_spark.marc import dataframe as mdf
from dlx_spark.marc import query as q
from dlx_spark.marc.record import (
    Auth,
    AuthIndex,
    AuthInUse,
    Bib,
    Datafield,
    InvalidAuthXref,
    Linked,
    Marc,
)


class InvalidAuthField(Exception):
    def __init__(self, rtype, tag, code):
        super().__init__(f"{tag}${code} must be authority-controlled")


class InvalidNonAuthField(Exception):
    def __init__(self, rtype, tag, code):
        super().__init__(f"{tag}${code} is not authority-controlled but has an xref")


_RECORD_CLASS = {"bib": Bib, "auth": Auth}


class MarcStore:
    N_BUCKETS = 16

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._auth_index: AuthIndex | None = None
        self._query_ctxs: dict = {}
        fsio.mkdirs(spark, root)
        self._recover()

    # --- paths / raw IO -----------------------------------------------------

    def _path(self, name: str) -> str:
        return fsio.join(self.root, name)

    def _exists(self, name: str) -> bool:
        # one listing through the warehouse's own filesystem (fsio): the
        # root may be a file:// / hdfs:// / s3a:// URI, not driver-local
        return any(f.endswith(".parquet") or f.startswith("pt=")
                   for f in fsio.listdir(self.spark, self._path(name)))

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema=schema)

    def table(self, record_type: str) -> DataFrame:
        name = "bibs" if record_type == "bib" else "auths"
        if not self._exists(name):
            return self._empty(schemas.MARC)
        return self.spark.read.parquet(self._path(name)).drop("pt")

    def bibs(self) -> DataFrame:
        return self.table("bib")

    def auths(self) -> DataFrame:
        return self.table("auth")

    def history_df(self, record_type: str) -> DataFrame:
        name = f"{record_type}_history"
        if not self._exists(name):
            return self._empty(schemas.HISTORY)
        return self.spark.read.parquet(self._path(name))

    def headings(self) -> DataFrame:
        return mdf.auth_headings(self.auths())

    # Above this many auth records the driver-side cache stops being
    # "broadcast-sized" and becomes a multi-GB driver structure; the
    # distributed paths (commit_frame's headings join, resolve_values)
    # don't need it, so refuse instead of silently degrading.
    AUTH_INDEX_MAX_ROWS = 5_000_000

    def auth_index(self) -> AuthIndex:
        """The in-process authority dimension (broadcast-sized by the
        same argument as the reference's Auth.build_cache).  Memoized
        per store and invalidated by every auth write, so repeated
        reads/commits don't rescan the auths table.

        Guarded: if the auths table exceeds ``AUTH_INDEX_MAX_ROWS``
        this raises rather than pulling a multi-GB dimension onto the
        driver — use the distributed resolution paths instead
        (``MarcStore.commit_frame`` resolves xrefs via the headings
        join; ``MarcDataFrame.resolve_values`` is a broadcast join)."""
        if self._auth_index is None:
            # cap probe stops scanning at cap+1 rows instead of a full
            # count() pass (the index rebuilds after every auth write,
            # so a whole-table pre-count would double rebuild I/O)
            n = self.auths().limit(self.AUTH_INDEX_MAX_ROWS + 1).count()
            if n > self.AUTH_INDEX_MAX_ROWS:
                raise RuntimeError(
                    f"auth_index(): auths table exceeds the "
                    f"driver-cache cap of {self.AUTH_INDEX_MAX_ROWS:,} rows. The "
                    "record-at-a-time facade cannot hold this dimension in "
                    "driver memory; use the distributed paths instead "
                    "(commit_frame for bulk writes, resolve_values for "
                    "linked-value reads).")
            idx = AuthIndex()
            for row in self.auths().toLocalIterator():
                idx.add(Auth.from_row(row, auth_index=idx))
            self._auth_index = idx
        return self._auth_index

    def _invalidate_auth_index(self) -> None:
        self._auth_index = None

    # --- reads ---------------------------------------------------------------

    def get(self, record_type: str, rid: int) -> Marc | None:
        # prune to the one pt bucket holding this id (pt = _id % N) so a
        # point read lists/scans 1/N of the table's files
        name = "bibs" if record_type == "bib" else "auths"
        if not self._exists(name):
            return None
        rows = (self.spark.read.parquet(self._path(name))
                .filter((F.col("pt") == int(rid) % self.N_BUCKETS)
                        & (F.col("_id") == rid))
                .drop("pt").collect())
        if not rows:
            return None
        return _RECORD_CLASS[record_type].from_row(rows[0], auth_index=self.auth_index())

    def search(self, record_type: str, query_string: str,
               sort=None, skip: int = 0, limit: int = 0) -> DataFrame:
        """Parse and execute a query-DSL string against the LIVE table —
        the reference's ``MarcSet.from_query(Query.from_string(...))``
        read path (dlx/marc/query.py:112-346) as one call, with the
        store's physical layout exploited:

        - point-id terms (``id:n`` / ``001:n``) prune the scan to the
          pt bucket holding the id (pt = _id % N_BUCKETS) at the
          PARTITION level, so 1/N of the store's files are listed and
          read — the plan analog of the reference's ``_id`` index
          (asserted at the executed-plan level in
          tests/test_marc_query_scale.py);
        - fielded text terms run through one cached tokenized subfield
          view per record type (a long-lived QueryContext, invalidated
          on any mutation) — the session-level analog of the
          reference's persistent ``_index_{tag}`` collections: the
          first text query pays the index build, every later one
          reuses it;
        - everything else (logical fields, audit dates, xref
          containment) is a single codegen'd predicate pass over the
          stored derived columns: no shuffle, no Python.

        Returns the matching records as a DataFrame (canonical nested
        schema, no ``pt``)."""
        from dlx_spark.marc import parser as mparser
        name = "bibs" if record_type == "bib" else "auths"
        query = q.Query.from_string(query_string, record_type=record_type,
                                    auth_index=self.auth_index())
        if not self._exists(name):
            return self._empty(schemas.MARC)
        raw = self.spark.read.parquet(self._path(name))
        for cond in query.conditions:
            buckets = self._id_buckets(cond)
            if buckets is not None:
                raw = raw.filter(
                    F.col("pt").isin(sorted(buckets)))
        out = mparser.execute_query(query, self._query_context(record_type),
                                    df=raw.drop("pt"))
        # sort/skip/limit: the find()-cursor modifiers of the
        # reference's from_query path (same semantics as
        # MarcSet.from_query).  Sort before skip/limit, as a cursor does
        if sort is not None:
            out = out.orderBy(*sort)
        if skip:
            out = out.offset(skip)
        if limit:
            out = out.limit(limit)
        return out

    def _query_context(self, record_type: str):
        """The long-lived query context for ``record_type`` — its
        tokenized subfield view is cached across searches (the
        reference's persistent index-collection analog) and dropped by
        ``_invalidate_query_contexts`` on any table mutation."""
        from dlx_spark.marc import parser as mparser
        ctx = self._query_ctxs.get(record_type)
        if ctx is None:
            ctx = mparser.QueryContext(self.table(record_type), record_type,
                                       auth_index=self.auth_index(),
                                       headings=self.headings(),
                                       tokens=self._search_index_df(
                                           record_type))
            self._query_ctxs[record_type] = ctx
        return ctx

    def _invalidate_query_contexts(self) -> None:
        """Drop every cached query context (unpersisting its tokenized
        view).  Called on ANY mutation of either table: bib edits
        change the bib tokens, auth edits change the heading values the
        token view denormalizes into BOTH record types."""
        for rt in list(self._query_ctxs):
            ctx = self._query_ctxs.pop(rt)
            try:
                ctx.close()
            except Exception:
                pass

    # --- persisted search index -----------------------------------------------

    def _tokens_name(self, record_type: str) -> str:
        return ("bibs" if record_type == "bib" else "auths") + "_tokens"

    def _dirty_marker_path(self, record_type: str) -> str:
        return fsio.join(self.root,
                         f"_dirty_{self._tokens_name(record_type)}.json")

    def _write_dirty_marker(self, record_type: str,
                            buckets: list[int] | None) -> None:
        import json as _json
        fsio.write_text_atomic(self.spark,
                               self._dirty_marker_path(record_type),
                               _json.dumps({"buckets": buckets}))

    def build_search_index(self, record_type: str) -> None:
        """Materialize the tokenized subfield view as a PERSISTED,
        bucketed table under the store root — the engine's analog of
        the reference's persistent ``_index_{tag}`` collections
        (dlx/marc/query.py:112-148, maintained there on every commit).
        Once built, it is maintained INCREMENTALLY: every commit/delete
        re-derives only the touched pt buckets from the live table (the
        source of truth) under a write-ahead dirty marker, so a crash
        at ANY point between the live swap and the index refresh
        re-converges on the next store open (``_recover`` re-runs the
        idempotent derive-from-live).  ``search`` then reads the index
        instead of building a per-session tokenized cache: the cold
        fielded-text query drops from an O(store) tokenize (pandas-UDF
        stemming over every subfield — 18.6 s at 1M records) to a plain
        parquet scan, and the stemming UDF leaves the QUERY plan
        entirely — across sessions, which is what matters at 100 TB
        where a per-session rebuild would be hours."""
        self._write_dirty_marker(record_type, None)
        self._refresh_search_index(record_type, None)

    def _refresh_search_index(self, record_type: str,
                              buckets: list[int] | None,
                              new_df: DataFrame | None = None,
                              removed_ids: list[int] | None = None) -> None:
        """Bring the persisted token index's touched buckets current and
        swap them in (crash-safe bucket overwrite), then clear the dirty
        marker.  Two paths, one invariant:

        - HOT path (``new_df``/``removed_ids`` from a commit or delete):
          the batch's token rows are re-derived and unioned with the
          UNTOUCHED records' existing rows in the touched buckets (an
          anti-join, exactly the live upsert's own shape) — maintenance
          costs O(batch) tokenize plus the bucket rewrite I/O, never a
          re-tokenize of every record sharing a bucket.
        - RECOVERY/build path (neither given): the touched buckets
          re-derive WHOLESALE from the live table.  Slower, but
          idempotent from the source of truth — which is what the
          dirty-marker replay needs, since it cannot know what the
          interrupted batch contained.

        The two produce identical rows because untouched records' token
        rows are current by induction (heading edits propagate as
        recommits of the attached records, so 'attached but untouched'
        cannot exist) — the identity the shared derivation
        (mdf.subfield_token_rows) plus the crash-recovery test pin."""
        name_live = "bibs" if record_type == "bib" else "auths"
        tname = self._tokens_name(record_type)
        if not self._exists(name_live):
            fsio.remove(self.spark, self._dirty_marker_path(record_type))
            return
        incremental = (self._exists(tname)
                       and (new_df is not None or removed_ids))
        if incremental:
            existing = self.spark.read.parquet(self._path(tname))
            if buckets is not None:
                existing = existing.filter(F.col("pt").isin(buckets))
            existing = existing.drop("pt")
            if new_df is not None:
                keep = existing.join(
                    new_df.select(F.col("_id").alias("record_id")),
                    "record_id", "left_anti")
                fresh = mdf.subfield_token_rows(new_df, record_type,
                                                headings=self.headings())
                tokens = keep.unionByName(fresh)
            else:
                tokens = existing.filter(
                    ~F.col("record_id").isin(list(removed_ids)))
        else:
            live = self.spark.read.parquet(self._path(name_live))
            if buckets is not None:
                live = live.filter(F.col("pt").isin(buckets))
            tokens = mdf.subfield_token_rows(live.drop("pt"), record_type,
                                             headings=self.headings())
        self._stage(tokens, f"_stage_{tname}")
        self._overwrite_buckets(tname, f"_stage_{tname}", buckets)
        fsio.remove(self.spark, self._dirty_marker_path(record_type))

    def _search_index_df(self, record_type: str) -> DataFrame | None:
        tname = self._tokens_name(record_type)
        if not self._exists(tname):
            return None
        return self.spark.read.parquet(self._path(tname)).drop("pt")

    def _id_buckets(self, cond) -> set[int] | None:
        """pt buckets implied by a point-id condition: {n % N} for an
        IdSearch, their union for an Or made solely of IdSearches, None
        (no pruning) otherwise.  Top-level conditions AND together, so
        each non-None set becomes its own partition filter."""
        if isinstance(cond, q.IdSearch):
            return {cond.id % self.N_BUCKETS}
        if isinstance(cond, q.Or) and cond.conditions and all(
                isinstance(c, q.IdSearch) for c in cond.conditions):
            return {c.id % self.N_BUCKETS for c in cond.conditions}
        return None

    def max_id(self, record_type: str) -> int:
        """max _id over live ∪ history (reference Marc.max_id,
        dlx/marc/__init__.py:474-483)."""
        live = self.table(record_type).select(F.max("_id").alias("m")).first()["m"] or 0
        hist = self.history_df(record_type).select(F.max("record_id").alias("m")).first()["m"] or 0
        return max(live, hist)

    # --- write pipeline -------------------------------------------------------

    def commit(self, records: list[Marc], user: str = "admin", now: datetime | None = None,
               auth_check: bool = True, update_attached: bool = True) -> list[int]:
        if isinstance(records, Marc):
            records = [records]
        if not records:
            return []
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)

        # commit auths before bibs so same-batch xrefs resolve
        auths = [r for r in records if r.record_type == "auth"]
        bibs = [r for r in records if r.record_type == "bib"]
        out: list[int] = []
        if auths and bibs:
            out += self.commit(auths, user=user, now=now, auth_check=auth_check,
                               update_attached=update_attached)
            out += self.commit(bibs, user=user, now=now, auth_check=auth_check,
                               update_attached=update_attached)
            return out

        record_type = records[0].record_type
        try:
            return self._commit_batch(records, record_type, user, now,
                                      auth_check, update_attached)
        except Exception:
            # the memoized auth index is mutated in step with the commit;
            # a failed commit leaves it desynchronized — drop it
            if record_type == "auth":
                self._invalidate_auth_index()
            raise

    def _commit_batch(self, records: list[Marc], record_type: str, user: str,
                      now: datetime, auth_check: bool, update_attached: bool) -> list[int]:
        idx = self.auth_index()
        if record_type == "auth":
            # heading changes detected against the pre-commit state
            prev_headings = {r.id: self._heading_signature(idx.get(r.id))
                             for r in records if r.id is not None}
            for rec in records:
                if rec.id is not None:
                    idx.remove(rec.id)

        # 1. id assignment (batch counter replacement)
        next_id = self.max_id(record_type) + 1
        for rec in records:
            if rec.id is None:
                rec.id = next_id
                next_id += 1

        # previous states for audit/history
        ids = [r.id for r in records]
        prev_rows = {row["_id"]: row for row in
                     self.table(record_type).filter(F.col("_id").isin(ids)).collect()}

        for rec in records:
            if record_type == "auth":
                idx.add(rec)

        # 2. validation
        for rec in records:
            rec.validate()
            if auth_check:
                self._auth_validate(rec, idx)

        # 3. audit stamps (created preserved, dlx/marc/__init__.py:867-888)
        for rec in records:
            rec.updated = now
            rec.user = user
            prev = prev_rows.get(rec.id)
            if prev is not None:
                rec.created = prev["created"]
                rec.created_user = prev["created_user"]
            else:
                rec.created = now
                rec.created_user = user

        # 4. derived columns as one DataFrame job over the new rows.
        # to_row() already resolved linked values through the in-process
        # auth index (they ride as caches in the nested rows), so the
        # whole derivation is a map-only projection — zero shuffles.
        # Materialize ONCE to a scratch parquet (distributed) instead of
        # the old collect()/createDataFrame driver round-trip, so bulk
        # batches never funnel record rows through the driver.
        name = "bibs" if record_type == "bib" else "auths"
        new_df = self.spark.createDataFrame([r.to_row() for r in records],
                                            schema=schemas.MARC)
        derived = mdf.derive_text_words(new_df, headings=None)
        derived = mdf.derive_logical_fields(derived, record_type, headings=None)
        staged = self._stage(derived, f"_stage_commit_{name}")

        # 5. history append (full new doc = next version) — one
        # distributed job over the staged frame
        prev_id_df = self.spark.createDataFrame(
            [(int(i),) for i in prev_rows], "record_id long")
        self._append_history_frame(record_type, staged, user, now,
                                   prev_id_df=prev_id_df)

        # 6. bucketed upsert
        self._upsert(record_type, staged, ids)
        self._unstage(f"_stage_commit_{name}")

        out = ids

        # 7. heading-change propagation (reference 1154-1232)
        if record_type == "auth" and update_attached:
            changed = [r for r in records
                       if r.id in prev_headings
                       and prev_headings[r.id] is not None
                       and prev_headings[r.id] != self._heading_signature(r)]
            if changed:
                self._propagate_heading_changes([r.id for r in changed], user, now)
        return out

    def commit_frame(self, df: DataFrame, record_type: str = "bib",
                     user: str = "admin", now: datetime | None = None,
                     auth_check: bool = True,
                     prev_ids: DataFrame | None = None) -> int:
        """Bulk-ingest commit: the whole pipeline (id assignment, auth
        validation, audit stamps, derived columns, history, upsert) as
        distributed jobs over a MARC-schema DataFrame — record rows
        never materialize on the driver.  This is the 100 TB path used
        by ``scripts/marc_import.py`` and the streaming ingest sink; the
        record-object ``commit`` remains the interactive facade.

        Input ``_id`` may be NULL (new records get ``max_id + seq``);
        non-null ids upsert.  Ids must be unique within the frame.
        Linked subfield values are resolved via the headings join (the
        distributed analog of the reference's auth cache).  For auth
        frames, validation accepts xrefs to auths carried (with explicit
        ids) in the SAME frame — the intra-file see-also case — though
        their linked VALUES still resolve on the next derive; xrefs to
        rows whose ids are assigned inside this call (NULL ``_id``)
        cannot be referenced intra-frame.  Returns the number of
        records committed.

        ``prev_ids`` (a DataFrame with one ``record_id`` column) fixes
        which ids count as pre-existing for history created-stamps;
        when omitted it is derived from the live table.  A replaying
        caller (the streaming sink) passes the snapshot it took before
        its first attempt so a re-run stamps history identically.
        """
        from pyspark.sql import Window

        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        name = "bibs" if record_type == "bib" else "auths"
        src = self._stage(df, f"_stage_ingest_{name}")
        try:
            if src.limit(1).count() == 0:
                return 0
            # distributed auth validation: every xref must exist in auths —
            # or, for an auth frame, in the frame itself: authority files
            # commonly carry intra-file see-also (5xx) xrefs between
            # records of the same import, which the reference's
            # sequential commit accepts because earlier records land
            # before later ones validate
            if auth_check:
                known = self.auths().select(F.col("_id").alias("xref"))
                if record_type == "auth":
                    known = known.unionByName(
                        src.filter(F.col("_id").isNotNull())
                           .select(F.col("_id").alias("xref")))
                bad = (mdf.explode_subfields(src, record_type)
                       .filter(F.col("xref").isNotNull())
                       .join(known, "xref", "left_anti")
                       .select("tag", "code", "xref").limit(1).collect())
                if bad:
                    raise InvalidAuthXref(record_type, bad[0]["tag"],
                                          bad[0]["code"], bad[0]["xref"])

            # id assignment for NULL-_id rows: max_id + dense sequence via
            # per-partition offsets — the only driver data is one count per
            # partition, never record rows
            if src.filter(F.col("_id").isNull()).limit(1).count() > 0:
                # seq base = max over store AND the frame's explicit ids,
                # so same-frame upserts can't collide with assignments
                frame_max = src.agg(F.max("_id")).first()[0] or 0
                base_id = max(self.max_id(record_type), int(frame_max))
                tmp = self._stage(
                    src.withColumn("_pid", F.spark_partition_id())
                       .withColumn("_mid", F.monotonically_increasing_id()),
                    f"_stage_ingest_ids_{name}")
                counts = (tmp.filter(F.col("_id").isNull())
                          .groupBy("_pid").count().collect())
                offsets, acc = {}, 0
                for row in sorted(counts, key=lambda r: r["_pid"]):
                    offsets[row["_pid"]] = acc
                    acc += row["count"]
                omap = F.create_map(
                    *[F.lit(x) for k, v in offsets.items() for x in (k, v)])
                wn = Window.partitionBy("_pid").orderBy("_mid")
                assigned = (tmp.filter(F.col("_id").isNull())
                            .withColumn("_id", (F.lit(base_id) + omap[F.col("_pid")]
                                                + F.row_number().over(wn)).cast("long")))
                src = (tmp.filter(F.col("_id").isNotNull())
                       .unionByName(assigned).drop("_pid", "_mid"))

            # audit stamps: created preserved from the live row when present
            live = self.table(record_type).select(
                "_id", F.col("created").alias("_pc"),
                F.col("created_user").alias("_pcu"))
            stamped = (src.drop("updated", "user", "created", "created_user")
                       .join(live, "_id", "left")
                       .withColumn("updated", F.lit(now))
                       .withColumn("user", F.lit(user))
                       .withColumn("created", F.coalesce("_pc", F.lit(now)))
                       .withColumn("created_user", F.coalesce("_pcu", F.lit(user)))
                       .drop("_pc", "_pcu")
                       .select(*[f.name for f in schemas.MARC.fields]))

            # derived columns with linked values baked in via headings join
            derived = mdf.derive_text_words(stamped, headings=self.headings())
            derived = mdf.derive_logical_fields(derived, record_type, headings=None)
            staged = self._stage(derived, f"_stage_commit_{name}")

            # prev-id set for history created-stamps, computed as a join
            # (lazily — the history write below runs before the upsert
            # overwrites the live table it reads)
            prev_source = (prev_ids if prev_ids is not None
                           else self.table(record_type)
                                .select(F.col("_id").alias("record_id")))
            prev_id_df = (staged.select(F.col("_id").alias("record_id"))
                          .join(prev_source, "record_id", "left_semi"))
            self._append_history_frame(record_type, staged, user, now,
                                       prev_id_df=prev_id_df)
            n = staged.count()
            self._upsert(record_type, staged, ids=None)
        finally:
            for scratch in (f"_stage_ingest_{name}", f"_stage_ingest_ids_{name}",
                            f"_stage_commit_{name}"):
                self._unstage(scratch)
            if record_type == "auth":
                self._invalidate_auth_index()
        return n

    @staticmethod
    def _heading_signature(rec: Marc | None):
        if rec is None:
            return None
        hf = rec.heading_field if isinstance(rec, Auth) else None
        if hf is None:
            return None
        return (hf.tag, tuple((s.code, s.value) for s in hf.subfields))

    def _auth_validate(self, rec: Marc, idx: AuthIndex) -> None:
        """Reference auth_validate (dlx/marc/__init__.py:890-904)."""
        for field in rec.fields:
            if not isinstance(field, Datafield):
                continue
            for sub in field.subfields:
                controlled = config.is_authority_controlled(rec.record_type, field.tag, sub.code)
                if controlled:
                    if not isinstance(sub, Linked):
                        raise InvalidAuthField(rec.record_type, field.tag, sub.code)
                    if idx.lookup(sub.xref, sub.code) is None:
                        raise InvalidAuthXref(rec.record_type, field.tag, sub.code, sub.xref)
                elif isinstance(sub, Linked):
                    raise InvalidNonAuthField(rec.record_type, field.tag, sub.code)

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        # record tables bucket on _id; the persisted token index buckets
        # on record_id — same value, so live bucket b and its token rows
        # always co-locate and one `buckets` list drives both rewrites
        key = "_id" if "_id" in df.columns else "record_id"
        return df.withColumn("pt", F.pmod(F.col(key), F.lit(self.N_BUCKETS)).cast("int"))

    def _upsert(self, record_type: str, new_df: DataFrame,
                ids: list[int] | None) -> None:
        """Rewrite only the buckets containing touched ids (dynamic
        partition overwrite).  The union is staged to a scratch dir so
        the read and the overwrite of the same path never overlap.
        Production swap-in: Delta/Iceberg MERGE INTO.

        ``ids=None`` is the distributed mode: touched BUCKETS come from a
        tiny distinct-pmod aggregate of ``new_df`` (<= N_BUCKETS rows to
        the driver, never ids), the touched-id set is an anti-join — so
        a small batch rewrites only its buckets and a full rebuild never
        enumerates ids on the driver (rebuild_derived at 100M records)."""
        name = "bibs" if record_type == "bib" else "auths"
        path = self._path(name)

        if self._exists(name):
            existing = self.spark.read.parquet(path)
            if ids is not None:
                buckets = sorted({i % self.N_BUCKETS for i in ids})
                existing = (existing.filter(F.col("pt").isin(buckets))
                            .filter(~F.col("_id").isin(ids)))
            else:
                buckets = sorted(r["pt"] for r in new_df.select(
                    F.pmod(F.col("_id"), F.lit(self.N_BUCKETS)).cast("int")
                    .alias("pt")).distinct().collect())
                existing = (existing.filter(F.col("pt").isin(buckets))
                            .join(new_df.select("_id"), "_id", "left_anti"))
            union = existing.drop("pt").unionByName(new_df, allowMissingColumns=True)
        else:
            buckets = None
            union = new_df

        index_live = self._exists(self._tokens_name(record_type))
        if index_live:
            # write-ahead DIRTY marker BEFORE the live swap: a crash
            # anywhere between here and the index refresh leaves the
            # marker behind, and recovery re-derives the touched
            # buckets from the live table — idempotent, so the index
            # can never silently go stale
            self._write_dirty_marker(record_type, buckets)
        self._stage(union, f"_stage_{name}")
        self._overwrite_buckets(name, f"_stage_{name}", buckets)
        if index_live:
            self._refresh_search_index(record_type, buckets, new_df=new_df)

    def compact(self, record_type: str) -> None:
        """Fold the small files that per-commit dynamic overwrites leave
        behind into one file per pt bucket — the maintenance job any
        upsert-heavy parquet layout needs (the Delta/Iceberg OPTIMIZE
        analog).  One distributed rewrite; no rows touch the driver."""
        name = "bibs" if record_type == "bib" else "auths"
        if not self._exists(name):
            return
        live = self.spark.read.parquet(self._path(name))
        self._stage(live.repartition(self.N_BUCKETS, "pt").drop("pt"),
                    f"_stage_compact_{name}")
        self._overwrite_buckets(name, f"_stage_compact_{name}", None)

    # --- crash-safe bucket swap ----------------------------------------------
    #
    # The stage-then-overwrite window in _upsert/compact/_remove_live is not
    # atomic on a plain parquet store: a crash after the staged union lands
    # but during the dynamic partition overwrite can tear the live table
    # (some buckets new, some old, or a bucket dir half-written).  A
    # write-ahead marker makes the swap REDOABLE: the marker (atomic
    # tmp+rename) records the stage path and the touched buckets before the
    # overwrite starts, and is removed only after it completes; reopening
    # the store replays any pending swap from the still-present stage (the
    # stage holds the full post-image of every touched bucket, so replaying
    # is idempotent).  Production swap-in: a Delta/Iceberg transaction log.

    def _txn_path(self, name: str) -> str:
        return fsio.join(self.root, f"_txn_{name}.json")

    def _write_txn_marker(self, name: str, payload: dict) -> None:
        import json
        fsio.write_text_atomic(self.spark, self._txn_path(name),
                               json.dumps(payload))

    def _clear_txn_marker(self, name: str) -> None:
        fsio.remove(self.spark, self._txn_path(name))

    def _overwrite_buckets(self, name: str, stage_name: str,
                           buckets: list[int] | None) -> None:
        """Swap the staged post-image into the live table's touched
        buckets under a write-ahead marker.  ``buckets`` is the full set
        the caller touched; any touched bucket with NO rows in the stage
        is dropped outright (dynamic overwrite alone would leave its old
        files behind)."""
        self._write_txn_marker(name, {"stage": stage_name,
                                      "buckets": buckets})
        self._apply_overwrite(name, stage_name, buckets)
        self._clear_txn_marker(name)
        self._unstage(stage_name)
        # every live-table mutation funnels through this swap: cached
        # query contexts (tokenized subfield views) are now stale
        self._invalidate_query_contexts()

    def _apply_overwrite(self, name: str, stage_name: str,
                         buckets: list[int] | None) -> None:
        staged = self.spark.read.parquet(self._path(stage_name))
        present: set[int] = set()
        if staged.limit(1).count():
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            bucketed = self._with_bucket(staged)
            bucketed.write.mode("overwrite").partitionBy("pt").parquet(self._path(name))
            present = {r["pt"] for r in bucketed.select("pt").distinct().collect()}
        for b in buckets or []:
            if b not in present:
                fsio.rmtree(self.spark, fsio.join(self._path(name), f"pt={b}"))

    def _recover(self) -> None:
        """Replay any bucket swap whose marker survived a crash.  Called
        on open; a no-op when no marker exists.  A torn marker (crash
        mid-publish on a scheme with non-atomic rename) parses as
        garbage and is discarded — the stage it would have pointed at is
        re-derivable by re-running the interrupted commit."""
        import json
        for marker in fsio.glob(self.spark, fsio.join(self.root, "_txn_*.json")):
            name = fsio.basename(marker)[len("_txn_"):-len(".json")]
            try:
                payload = json.loads(fsio.read_text(self.spark, marker))
                stage_name = payload["stage"]
                if not isinstance(stage_name, str):
                    raise TypeError("non-string stage in txn marker")
            except (ValueError, KeyError, TypeError):
                # torn write (non-atomic rename schemes) or foreign
                # content: never act on garbage — the interrupted commit
                # re-runs from its caller
                fsio.remove(self.spark, marker)
                continue
            if fsio.is_dir(self.spark, self._path(stage_name)):
                self._apply_overwrite(name, stage_name, payload.get("buckets"))
                self._unstage(stage_name)
            self._clear_txn_marker(name)
        # dirty SEARCH-INDEX markers replay AFTER the swaps above, so
        # the rebuild derives from the recovered live table.  A torn
        # marker reads as buckets=None — a full rebuild, always safe
        for marker in fsio.glob(self.spark,
                                fsio.join(self.root, "_dirty_*_tokens.json")):
            record_type = ("bib" if fsio.basename(marker).startswith(
                "_dirty_bibs") else "auth")
            try:
                buckets = json.loads(
                    fsio.read_text(self.spark, marker)).get("buckets")
            except ValueError:
                buckets = None
            self._refresh_search_index(record_type, buckets)

    def _stage(self, df: DataFrame, name: str) -> DataFrame:
        p = self._path(name)
        df.write.mode("overwrite").parquet(p)
        return self.spark.read.parquet(p)

    def _unstage(self, name: str) -> None:
        fsio.rmtree(self.spark, self._path(name))

    def _append_history_frame(self, record_type: str, df: DataFrame,
                              user: str, now: datetime,
                              prev_id_df: DataFrame | None = None) -> None:
        """History append as ONE distributed job over the committed
        frame: per-id version bases come from a semi-join-filtered
        aggregate of the existing history, new-vs-update from a left
        join against ``prev_id_df`` (ids that existed pre-commit).  No
        record rows touch the driver."""
        name = f"{record_type}_history"
        existing = self.history_df(record_type)
        ids_df = df.select(F.col("_id").alias("record_id"))
        vbase = (existing.join(ids_df, "record_id", "left_semi")
                 .groupBy("record_id").agg(F.max("version").alias("_vbase")))
        doc = F.struct(*[F.col(f.name) for f in schemas.MARC.fields]).alias("doc")
        base = df.select(F.col("_id").alias("record_id"), doc) \
                 .join(vbase, "record_id", "left")
        if prev_id_df is not None:
            prev = prev_id_df.select("record_id", F.lit(True).alias("_prev"))
            base = base.join(prev, "record_id", "left")
        else:
            base = base.withColumn("_prev", F.lit(None).cast("boolean"))
        is_new = F.col("_prev").isNull()
        actions_t = schemas.HISTORY["actions"].dataType.simpleString()
        hist = base.select(
            "record_id",
            (F.coalesce(F.col("_vbase"), F.lit(0)) + 1).cast("int").alias("version"),
            "doc",
            F.when(is_new, F.lit(user)).alias("created_user"),
            F.when(is_new, F.lit(now)).alias("created_time"),
            F.lit(None).cast("string").alias("deleted_user"),
            F.lit(None).cast("timestamp").alias("deleted_time"),
            F.lit(None).cast("string").alias("restored_user"),
            F.lit(None).cast("timestamp").alias("restored_time"),
            F.expr(f"cast(array() as {actions_t})").alias("actions"),
            F.lit(None).cast("long").alias("merged_into"),
            F.lit(None).cast("timestamp").alias("merged_time"),
        )
        hist.write.mode("append").parquet(self._path(name))

    # --- delete / restore / history -------------------------------------------

    def delete(self, record_type: str, rid: int, user: str = "admin",
               now: datetime | None = None) -> None:
        """Guarded delete with history 'deleted' action (reference
        dlx/marc/__init__.py:1236-1310)."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        if record_type == "auth":
            if mdf.in_use(self.bibs(), rid).limit(1).count() > 0 \
               or mdf.in_use(self.auths(), rid).limit(1).count() > 0:
                raise AuthInUse()

        row = self.table(record_type).filter(F.col("_id") == rid).collect()
        name = f"{record_type}_history"
        version_base = (self.history_df(record_type)
                        .filter(F.col("record_id") == rid)
                        .agg(F.max("version")).first()[0] or 0)
        action = {"type": "delete", "user": user, "time": now}
        hist_rows = [{
            "record_id": rid,
            "version": version_base + 1 if row else version_base,
            "doc": {f.name: row[0][f.name] for f in schemas.MARC.fields} if row else None,
            "created_user": None, "created_time": None,
            "deleted_user": user, "deleted_time": now,
            "restored_user": None, "restored_time": None,
            "actions": [action],
            "merged_into": None, "merged_time": None,
        }]
        (self.spark.createDataFrame(hist_rows, schema=schemas.HISTORY)
         .write.mode("append").parquet(self._path(name)))
        self._remove_live(record_type, [rid])
        if record_type == "auth":
            # the memoized index tracks commits incrementally (commit
            # mutates it in step with the upsert); deletes drop the whole
            # cache — cheap relative to their frequency
            self._invalidate_auth_index()

    def _remove_live(self, record_type: str, ids: list[int]) -> None:
        name = "bibs" if record_type == "bib" else "auths"
        if not self._exists(name):
            return
        path = self._path(name)
        buckets = sorted({i % self.N_BUCKETS for i in ids})
        keep = (self.spark.read.parquet(path)
                .filter(F.col("pt").isin(buckets))
                .filter(~F.col("_id").isin(ids))
                .drop("pt"))
        index_live = self._exists(self._tokens_name(record_type))
        if index_live:
            self._write_dirty_marker(record_type, buckets)
        self._stage(keep, f"_stage_{name}")
        # _overwrite_buckets drops any touched bucket the stage left empty
        # (dynamic overwrite alone would keep its old files)
        self._overwrite_buckets(name, f"_stage_{name}", buckets)
        if index_live:
            self._refresh_search_index(record_type, buckets,
                                       removed_ids=ids)

    def restore(self, record_type: str, rid: int, user: str = "admin",
                now: datetime | None = None) -> Marc:
        """Restore the last version of a deleted record; fails if a live
        record exists (reference History.restore, 2285-2343)."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        if self.table(record_type).filter(F.col("_id") == rid).limit(1).count():
            raise Exception(f"{record_type} {rid} is not deleted")
        versions = (self.history_df(record_type)
                    .filter((F.col("record_id") == rid) & F.col("doc").isNotNull())
                    .orderBy(F.desc("version")).limit(1).collect())
        if not versions:
            raise Exception(f"no history for {record_type} {rid}")
        doc = versions[0]["doc"]
        rec = _RECORD_CLASS[record_type].from_row(doc)
        self.commit([rec], user=user, now=now, auth_check=False, update_attached=False)
        action = {"type": "restore", "user": user, "time": now}
        hist_rows = [{
            "record_id": rid, "version": versions[0]["version"] + 1, "doc": None,
            "created_user": None, "created_time": None,
            "deleted_user": None, "deleted_time": None,
            "restored_user": user, "restored_time": now,
            "actions": [action], "merged_into": None, "merged_time": None,
        }]
        (self.spark.createDataFrame(hist_rows, schema=schemas.HISTORY)
         .write.mode("append").parquet(self._path(f"{record_type}_history")))
        return rec

    def revert(self, record_type: str, rid: int, version: int,
               user: str = "admin", now: datetime | None = None) -> Marc:
        """Reset a live record to history version N, 1-based (reference
        Marc.revert, dlx/marc/__init__.py:1349-1366) — the revert itself
        commits and becomes the newest version."""
        versions = self.history(record_type, rid)
        if not 1 <= version <= len(versions):
            raise Exception(f"no version {version} for {record_type} {rid}")
        rec = versions[version - 1]
        rec.id = rid
        self.commit([rec], user=user, now=now, auth_check=False,
                    update_attached=False)
        return rec

    def history(self, record_type: str, rid: int) -> list[Marc]:
        rows = (self.history_df(record_type)
                .filter((F.col("record_id") == rid) & F.col("doc").isNotNull())
                .orderBy("version").collect())
        return [_RECORD_CLASS[record_type].from_row(r["doc"]) for r in rows]

    def find_deleted(self, record_type: str,
                     date_from: datetime | None = None,
                     date_to: datetime | None = None) -> DataFrame:
        """Deleted-not-restored record ids by latest action time
        (reference History.find_deleted / deleted_by_date,
        dlx/marc/__init__.py:2345-2384)."""
        h = self.history_df(record_type)
        latest = (h.groupBy("record_id")
                  .agg(F.max(F.struct("version", "deleted_time", "restored_time")).alias("s")))
        out = (latest.filter(F.col("s.deleted_time").isNotNull()
                             & F.col("s.restored_time").isNull())
               .select("record_id", F.col("s.deleted_time").alias("deleted_time")))
        if date_from is not None:
            out = out.filter(F.col("deleted_time") >= date_from)
        if date_to is not None:
            out = out.filter(F.col("deleted_time") < date_to)
        return out

    def deleted_by_date(self, record_type: str, date_from: datetime,
                        date_to: datetime | None = None):
        """Yield ids of records deleted (and not restored) in the window
        (reference History.deleted_by_date, dlx/marc/__init__.py:2372-2384)."""
        out = self.find_deleted(record_type, date_from=date_from, date_to=date_to)
        for row in out.orderBy("record_id").collect():
            yield row["record_id"]

    # --- auth merge -----------------------------------------------------------

    def merge(self, gaining_id: int, losing_id: int, user: str = "admin",
              now: datetime | None = None) -> None:
        """Rewrite all referencing records losing→gaining, drop duplicate
        fields, delete the losing auth (reference Auth.merge,
        dlx/marc/__init__.py:2143-2233 — one deterministic batch, no
        polling)."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        idx = self.auth_index()
        if idx.get(gaining_id) is None or idx.get(losing_id) is None:
            raise Exception("both auths must exist")

        # losing→gaining rewrite + post-rewrite field dedup as pure array
        # expressions, committed through the distributed commit_frame —
        # an auth attached to 100k bibs rewrites with cluster
        # parallelism, no record rows on the driver.  The rewritten
        # subfield's cached value is NULLed; commit_frame's derive
        # re-resolves it from the gaining auth's heading.
        rewrite = f"""transform(datafields, f -> struct(
            f.tag as tag, f.ind1 as ind1, f.ind2 as ind2,
            transform(f.subfields, s -> IF(s.xref = {losing_id}L,
                named_struct('code', s.code, 'value', CAST(NULL AS STRING),
                             'xref', {gaining_id}L),
                s)) as subfields))"""
        # duplicate-field signature parity with Datafield.signature():
        # tag, indicators, and per-subfield (code, xref-or-value) — the
        # cached value of a LINKED subfield must not distinguish fields
        sig = lambda v: (
            f"struct({v}.tag, {v}.ind1, {v}.ind2, "
            f"transform({v}.subfields, s -> struct(s.code, "
            f"IF(s.xref IS NOT NULL, CAST(NULL AS STRING), s.value), s.xref)))")
        dedup_fields = (f"filter(_dfrw, (f, i) -> NOT exists(slice(_dfrw, 1, i), "
                        f"g -> {sig('g')} <=> {sig('f')}))")

        for rtype in ("bib", "auth"):
            attached = mdf.in_use(self.table(rtype), losing_id)
            if attached.limit(1).count() == 0:
                continue
            rewritten = (attached
                         .withColumn("_dfrw", F.expr(rewrite))
                         .withColumn("datafields", F.expr(dedup_fields))
                         .drop("_dfrw"))
            self.commit_frame(rewritten, record_type=rtype, user=user, now=now,
                              auth_check=False)

        self.delete("auth", losing_id, user=user, now=now)
        log_row = [{"gaining": gaining_id, "losing": losing_id, "user": user, "time": now}]
        (self.spark.createDataFrame(log_row, "gaining long, losing long, user string, time timestamp")
         .write.mode("append").parquet(self._path("merge_log")))

    def update_auth_use_counts(self) -> DataFrame:
        """Compute per-auth bib_use_count (reference calculate_auth_use,
        build_logical_fields.py:218-252) and return the counts joined to
        the auth ids; one light shuffle (partial aggregation)."""
        counts = mdf.auth_use_counts(self.bibs())
        return (self.auths().select(F.col("_id").alias("auth_id"))
                .join(counts, F.col("auth_id") == counts["xref"], "left")
                .select("auth_id", F.coalesce("bib_use_count", F.lit(0)).alias("bib_use_count")))

    # --- heading-change propagation --------------------------------------------

    def _propagate_heading_changes(self, changed_ids: list[int], user: str,
                                   now: datetime) -> None:
        """Recommit every record attached to a changed auth so cached
        linked values, text/words and logical fields refresh.  One
        DISTRIBUTED commit_frame batch per record type (the derive step
        re-resolves linked values from the just-committed headings) —
        attached sets of any size propagate without a driver collect.
        Recursion is structural: commit_frame never propagates."""

        def linked_to(aid: int):
            def field_pred(f):
                return F.exists(f["subfields"], lambda s: s["xref"] == aid)
            return F.exists("datafields", field_pred)

        for rtype in ("bib", "auth"):
            pred = None
            for aid in changed_ids:
                p = linked_to(aid)
                pred = p if pred is None else (pred | p)
            if pred is None:
                continue
            attached = self.table(rtype).filter(pred)
            if rtype == "auth":
                attached = attached.filter(~F.col("_id").isin(changed_ids))
            if attached.limit(1).count() == 0:
                continue
            self.commit_frame(attached, record_type=rtype, user=user, now=now,
                              auth_check=False)
