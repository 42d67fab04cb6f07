"""Maintenance CLIs — analogs of the reference's ``dlx/scripts``:

- ``marc_import``       ← marc_import.py (file → warehouse commit)
- ``rebuild_derived``   ← build_logical_fields.py + build_text_collections.py
                          (one deterministic job; re-run = resume)
- ``auth_merge``        ← auth_merge.py (one batch, no polling)

``init_indexes`` and ``clear_incrementers`` have no analog by design:
parquet layout + Catalyst replace Mongo indexes, and batch id assignment
replaces counters (SURVEY §4).
"""
