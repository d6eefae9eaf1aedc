from tpufusion.models.fcn import FCN
from tpufusion.models.losses import weighted_pose_loss
from tpufusion.models.metrics import batch_metrics

__all__ = ["FCN", "weighted_pose_loss", "batch_metrics"]
