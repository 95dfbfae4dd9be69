"""Solver core: state machine, status, hessian strategies."""
