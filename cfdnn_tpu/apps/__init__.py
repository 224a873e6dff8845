"""Case apps (reference app/ executables, SURVEY 2.9): channel, duct,
taylor_green_3d, cylinder, airfoil, step, hills — plus cavity (no
reference app; its cavity physics lives only inside a test there) —
run as `python -m cfdnn_tpu.apps.<case> [--key value ...]`."""

__all__ = ["channel", "duct", "taylor_green_3d", "cylinder", "airfoil",
           "step", "hills", "cavity"]
