from .fusion import VSSMFusion, VSSMFusionSeg, VSSStage, VSSStageUp

__all__ = ["VSSMFusion", "VSSMFusionSeg", "VSSStage", "VSSStageUp"]
