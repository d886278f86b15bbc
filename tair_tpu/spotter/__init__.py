from .charset import CTLABELS, MAX_WORD_LEN, PAD_ID, VOC_SIZE, decode_text, encode_text
from .losses import CriterionConfig, set_criterion
from .matcher import box_match, ctrl_point_match
from .ms_deform_attn import MSDeformAttn, ms_deform_attn_core
from .testr import TESTR, TESTRConfig, spotter_inference

__all__ = [
    "CTLABELS", "MAX_WORD_LEN", "PAD_ID", "VOC_SIZE",
    "decode_text", "encode_text",
    "CriterionConfig", "set_criterion",
    "box_match", "ctrl_point_match",
    "MSDeformAttn", "ms_deform_attn_core",
    "TESTR", "TESTRConfig", "spotter_inference",
]
