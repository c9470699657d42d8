"""ML surface: encoder inference UDFs, masking, metrics."""
