"""Callable-class stages for ``Dataset.map_batches`` actor pools."""
