"""Partition file format: column-chunk encoding, file writer/reader, manifest I/O."""
