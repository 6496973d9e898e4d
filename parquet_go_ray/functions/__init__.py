"""Pure numpy/pyarrow codec kernels and scalar helpers. No Ray imports here."""
