"""Plan introspection/assertion helpers — the engine's 'is this the plan I
want at 100 TB' checks (broadcast joins, filter pushdown, codegen spans)."""
