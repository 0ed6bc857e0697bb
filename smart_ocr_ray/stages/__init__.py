"""Ray Data pipeline stages: analyze → explode → extract → assemble.

Stage functions take and return ``pyarrow.Table`` batches
(``batch_format="pyarrow"``); the extract stage is a callable class so
``map_batches`` runs it as an actor pool (stateful-stage contract,
SURVEY.md §2.3).
"""
