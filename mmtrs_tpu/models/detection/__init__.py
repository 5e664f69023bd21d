"""TPU-native Mask R-CNN detection stack (SURVEY §7 hard-part 1).

- modules: Flax ResNet-FPN / RPN / box+mask heads (static shapes)
- ops: anchors, box coding, static NMS, matmul RoIAlign, mask pasting
- convert_torchvision: COCO checkpoint ingestion (name-mapped, testable
  hermetically via fake_state_dict)
- segmenter: MaskRCNNSegmenter implementing the pipeline's box contract
"""

from mmtrs_tpu.models.detection.convert_torchvision import (
    convert_state_dict,
    expected_torch_keys,
    fake_state_dict,
)
from mmtrs_tpu.models.detection.modules import DetectorConfig, MaskRCNN
from mmtrs_tpu.models.detection.segmenter import MaskRCNNSegmenter, load_detector

__all__ = [
    "DetectorConfig",
    "MaskRCNN",
    "MaskRCNNSegmenter",
    "convert_state_dict",
    "expected_torch_keys",
    "fake_state_dict",
    "load_detector",
]
