"""Pure vectorized kernels (numpy / pyarrow.compute). No Ray imports here."""
