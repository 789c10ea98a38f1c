from .geojson import geojson_docs_to_events, read_geojson_files
from .tables import load_tables, register_views

__all__ = [
    "geojson_docs_to_events",
    "read_geojson_files",
    "load_tables",
    "register_views",
]
