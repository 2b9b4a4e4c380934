"""Pure kernels: fingerprints, URL canonicalization, parsing, sketches."""
