"""Sources: deterministic transcript synthesis and read helpers."""
