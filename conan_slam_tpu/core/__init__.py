"""Numerics core: geometry, small linear algebra, guards."""
