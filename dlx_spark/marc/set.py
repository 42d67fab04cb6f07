"""Record-set API: ordered collections of Marc records bridging the
record-at-a-time API and the DataFrame layer.

Mirrors the reference MarcSet constructors (``/root/reference/dlx/marc/
__init__.py:60-431``) with Spark-native storage: a set is either a list
of in-memory records or a thin wrapper over a DataFrame of the canonical
nested schema (laziness preserved).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from dlx_spark import schemas
from dlx_spark.marc.record import Auth, AuthIndex, Bib, Marc


class MarcSet:
    record_class = Bib
    record_type = "bib"

    def __init__(self, records: Iterable[Marc] | None = None,
                 df: DataFrame | None = None,
                 auth_index: AuthIndex | None = None):
        self._records: Optional[list[Marc]] = list(records) if records is not None else None
        self._df = df
        self.auth_index = auth_index

    # --- constructors -------------------------------------------------------

    @classmethod
    def from_dicts(cls, docs: Iterable[dict], auth_index: AuthIndex | None = None) -> "MarcSet":
        return cls(records=[cls.record_class(d, auth_index=auth_index) for d in docs],
                   auth_index=auth_index)

    @classmethod
    def from_df(cls, df: DataFrame, auth_index: AuthIndex | None = None) -> "MarcSet":
        return cls(df=df, auth_index=auth_index)

    @classmethod
    def from_aggregation(cls, df_or_sql, spark: SparkSession | None = None,
                         auth_index: AuthIndex | None = None) -> "MarcSet":
        """Arbitrary-pipeline escape hatch (reference
        MarcSet.from_aggregation, dlx/marc/__init__.py:130-139): accepts
        a DataFrame of the canonical nested schema, or a SQL string run
        against the session's registered views."""
        if isinstance(df_or_sql, str):
            if spark is None:
                raise ValueError("spark session required for SQL input")
            df_or_sql = spark.sql(df_or_sql)
        return cls(df=df_or_sql, auth_index=auth_index)

    @classmethod
    def from_ids(cls, df: DataFrame, ids: list[int],
                 auth_index: AuthIndex | None = None) -> "MarcSet":
        """Reference MarcSet.from_ids (dlx/marc/__init__.py:141-143)."""
        return cls(df=df.filter(df["_id"].isin(ids)), auth_index=auth_index)

    @classmethod
    def from_query(cls, df: DataFrame, predicate, auth_index: AuthIndex | None = None,
                   sort=None, skip: int = 0, limit: int = 0) -> "MarcSet":
        """Filter-scan (reference MarcSet.from_query,
        dlx/marc/__init__.py:78-128).  ``predicate`` is a compiled Column
        (see dlx_spark.marc.query) or a Query/Condition object."""
        from dlx_spark.marc import query as q
        if isinstance(predicate, (q.Query, q.Condition, q.Or, q.Text, q.TagOnly, q.Raw)):
            predicate = q.compile_predicate(predicate, record_type=cls.record_type,
                                            auth_index=auth_index)
        out = df.filter(predicate)
        if sort is not None:
            out = out.orderBy(*sort)
        if skip:
            out = out.offset(skip)
        if limit:
            out = out.limit(limit)
        return cls(df=out, auth_index=auth_index)

    # --- materialization -------------------------------------------------------

    def records(self) -> Iterator[Marc]:
        if self._records is not None:
            yield from self._records
        elif self._df is not None:
            for row in self._df.toLocalIterator():
                yield self.record_class.from_row(row, auth_index=self.auth_index)

    def __iter__(self) -> Iterator[Marc]:
        return self.records()

    @property
    def count(self) -> int:
        if self._records is not None:
            return len(self._records)
        return self._df.count()

    # --- conversion ---------------------------------------------------------------

    def to_df(self, spark: SparkSession) -> DataFrame:
        if self._df is not None:
            return self._df
        rows = [r.to_row() for r in self._records]
        return spark.createDataFrame(rows, schema=schemas.MARC)

    def to_dicts(self) -> list[dict]:
        return [r.to_dict() for r in self.records()]


class BibSet(MarcSet):
    record_class = Bib
    record_type = "bib"


class AuthSet(MarcSet):
    record_class = Auth
    record_type = "auth"

    def build_index(self) -> AuthIndex:
        """Build the in-process authority dimension (reference
        Auth.build_cache, dlx/marc/__init__.py:1841-1874)."""
        idx = AuthIndex()
        for rec in self.records():
            idx.add(rec)
        return idx
