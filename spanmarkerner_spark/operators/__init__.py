"""Pipeline operators: NER stages, linking, components, relations,
dedup, similarity. Hot paths are built-in expressions or Arrow-batched
pandas UDFs — never per-row Python."""
