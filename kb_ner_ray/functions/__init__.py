"""Pure, unit-tested kernels shared by all stages (no Ray imports here)."""
