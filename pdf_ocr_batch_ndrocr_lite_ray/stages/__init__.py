"""Ray Data batch transforms: callables for ``Dataset.map_batches``."""
