"""Numerical kernels: LDLT with inertia, CGLS, KKT assembly."""
