"""JMARC record model, query DSL and DataFrame transforms.

- ``record``    — record-at-a-time API (Marc/Bib/Auth, fields, subfields)
- ``dataframe`` — nested-DataFrame ⇄ records, exploded view, auth joins,
                  derived-column jobs (text/words, logical fields)
- ``query``     — the search DSL compiled to Spark Column predicates
- ``store``     — parquet-backed warehouse with batch commit/history
"""

from dlx_spark.marc.record import (  # noqa: F401
    AmbiguousAuthValue,
    Auth,
    AuthInUse,
    Bib,
    Controlfield,
    Datafield,
    Diff,
    InvalidAuthValue,
    InvalidAuthXref,
    Linked,
    Literal,
    Marc,
    Subfield,
)
from dlx_spark.marc.set import BibSet, AuthSet, MarcSet  # noqa: F401
from dlx_spark.marc.query import (  # noqa: F401
    Any,
    AtlasQuery,
    AuthCondition,
    AuthQuery,
    BibCondition,
    BibQuery,
    Condition,
    Or,
    Query,
    QueryDocument,
    Raw,
    TagOnly,
    Text,
)
from dlx_spark.marc.parser import InvalidQueryString  # noqa: F401
# attaches the serialization method surface to the record/set classes
from dlx_spark.marc import serialization as _serialization  # noqa: F401,E402
