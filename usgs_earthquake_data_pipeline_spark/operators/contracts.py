"""Schema contracts: structural diff and compatibility checks.

The reference pins its output schema by hand-built StructType
(/root/reference/usgs-earthquake-data-ingest.py's 32-column schema;
mirrored in this repo's ``schema.py``) and evolves tables with
``mergeSchema`` (K6). What neither gives you is the REVIEW step: when
an upstream feed changes shape, which columns appeared, vanished, or
changed type — and is the change safe to deploy against existing
readers? This module answers that from two StructTypes, driver-side,
no data touched.

Compatibility rule (the parquet/Delta reader contract):
- added nullable column  -> backward compatible (old readers ignore
  it, new readers see NULL for old files via mergeSchema)
- added NON-nullable column -> breaking (old files cannot supply it)
- removed column         -> breaking for readers that project it
- type change            -> breaking unless a widening the formats
  resolve on read (int->long, float->double)
- nullable -> required   -> breaking; required -> nullable is safe
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import DataType, DoubleType, FloatType, IntegerType, LongType, StructType

_WIDENINGS: tuple[tuple[type, type], ...] = (
    (IntegerType, LongType),
    (FloatType, DoubleType),
)


def _is_widening(old: DataType, new: DataType) -> bool:
    return any(
        isinstance(old, narrow) and isinstance(new, wide)
        for narrow, wide in _WIDENINGS
    )


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    type_changed: list[tuple[str, str, str]] = field(default_factory=list)
    tightened: list[str] = field(default_factory=list)  # nullable -> required
    relaxed: list[str] = field(default_factory=list)  # required -> nullable
    breaking: list[str] = field(default_factory=list)  # human-readable reasons

    @property
    def is_backward_compatible(self) -> bool:
        return not self.breaking

    @property
    def is_noop(self) -> bool:
        return not (
            self.added or self.removed or self.type_changed
            or self.tightened or self.relaxed
        )


def schema_diff(old: StructType, new: StructType) -> SchemaDiff:
    """Structural diff of two schemas with the compatibility verdict
    (see module docstring for the rule). Field order is ignored —
    parquet/ORC resolve columns by name."""
    d = SchemaDiff()
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}

    for name, nf in new_fields.items():
        if name not in old_fields:
            d.added.append(name)
            if not nf.nullable:
                d.breaking.append(
                    f"added column '{name}' is non-nullable - old data cannot supply it"
                )
    for name, of in old_fields.items():
        if name not in new_fields:
            d.removed.append(name)
            d.breaking.append(f"removed column '{name}' breaks readers projecting it")
            continue
        nf = new_fields[name]
        if of.dataType != nf.dataType:
            d.type_changed.append(
                (name, of.dataType.simpleString(), nf.dataType.simpleString())
            )
            if not _is_widening(of.dataType, nf.dataType):
                d.breaking.append(
                    f"column '{name}' changed {of.dataType.simpleString()} -> "
                    f"{nf.dataType.simpleString()} (not a safe widening)"
                )
        if of.nullable and not nf.nullable:
            d.tightened.append(name)
            d.breaking.append(
                f"column '{name}' tightened nullable -> required"
            )
        elif not of.nullable and nf.nullable:
            d.relaxed.append(name)
    return d
