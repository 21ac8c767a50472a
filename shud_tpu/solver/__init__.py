from shud_tpu.solver.bdf import BDFState, SolverConfig, bdf_init, solve_to
