from unscene3d_tpu.losses.matcher import HungarianMatcher
from unscene3d_tpu.losses.criterion import SetCriterion
