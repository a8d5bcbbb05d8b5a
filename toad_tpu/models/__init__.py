from toad_tpu.models.toad_mil import ToadMIL, ToadOutputs

__all__ = ["ToadMIL", "ToadOutputs"]
