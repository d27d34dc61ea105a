"""Independent NumPy f64 reference-RTI oracle (JAX-free)."""
