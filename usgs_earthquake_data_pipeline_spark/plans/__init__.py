"""Named-query catalog: every SURVEY.md §2 operator (and the
LLM-pipeline extensions) exposed as a (Spark callable, DuckDB oracle
SQL) pair. The driver's correctness harness consumes this via
``__spark_entry__.queries()`` / ``oracle_sql()``."""

from .catalog import CATALOG, CatalogEntry, oracle_map, query_map  # noqa: F401
from . import llm_ops  # noqa: F401  (registers the LLM-pipeline entries)
from . import relational  # noqa: F401  (registers the relational-breadth entries)
from . import temporal  # noqa: F401  (registers the temporal-operator entries)
from . import tpch_extra  # noqa: F401  (registers the extended TPC-H shapes)
from . import curation  # noqa: F401  (registers the curation pipeline + sketches)
from . import sampling  # noqa: F401  (registers deterministic sampling/splits)
from . import streaming_entries  # noqa: F401  (registers the streaming entry)
from . import parity_geojson  # noqa: F401  (registers the GeoJSON parse-path entry)
from . import corpus_ops  # noqa: F401  (registers the corpus-curation entries)
from . import spatial  # noqa: F401  (registers the geospatial entries)
from . import warehouse  # noqa: F401  (registers MERGE/CDC table-maintenance entries)
from . import vocab_ops  # noqa: F401  (registers tokenizer/mixture vocabulary statistics)
from . import web_ops  # noqa: F401  (registers URL/domain web-curation entries)
