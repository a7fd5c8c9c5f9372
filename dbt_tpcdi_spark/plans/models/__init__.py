"""The 45 warehouse models, one function per reference model."""
