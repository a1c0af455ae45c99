from optimalinterpolation_tpu.io.pickles import load_pickle, save_pickle  # noqa: F401
