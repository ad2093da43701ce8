"""WESTPA plugin drivers (reference C18-C21).

Each driver wires the engine into WESTPA's sim_manager callback system. The
WESTPA-independent logic (restart bookkeeping, start-state weight computation,
haMSM construction from a config dict, optimized-bin construction) lives in
plain functions so it is testable -- and usable -- without a WESTPA install;
``import westpa`` only happens inside driver constructors.
"""

__all__ = [
    "H5AugmentationDriver",
    "MDAugmentationDriver",
    "HAMSMDriver",
    "RestartDriver",
    "OptimizationDriver",
]


def __getattr__(name):
    if name in ("H5AugmentationDriver", "MDAugmentationDriver"):
        from .augmentation_driver import H5AugmentationDriver, MDAugmentationDriver

        return {"H5AugmentationDriver": H5AugmentationDriver,
                "MDAugmentationDriver": MDAugmentationDriver}[name]
    if name == "HAMSMDriver":
        from .hamsm_driver import HAMSMDriver

        return HAMSMDriver
    if name == "RestartDriver":
        from .restart_driver import RestartDriver

        return RestartDriver
    if name == "OptimizationDriver":
        from .optimization_driver import OptimizationDriver

        return OptimizationDriver
    raise AttributeError(name)
