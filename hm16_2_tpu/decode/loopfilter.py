"""In-loop filters: deblocking + SAO application (decode side).

Deblocking dual: HM TComLoopFilter.cpp:130-923; SAO apply dual:
TComSampleAdaptiveOffset.cpp:309-630.  The batched TPU implementations live
in hm16_2_tpu.ops.deblock / hm16_2_tpu.ops.sao; this module orchestrates
them over a decoded PictureState.
"""

from __future__ import annotations

import numpy as np

from hm16_2_tpu.decode.picture import PictureState


def apply_loop_filters(pic: PictureState):
    any_deblock = any(not sh.deblocking_filter_disabled for sh in pic.slices)
    if any_deblock:
        from hm16_2_tpu.ops.deblock_ref import deblock_picture
        deblock_picture(pic)
    any_sao = any(sh.sao_luma or sh.sao_chroma for sh in pic.slices)
    if pic.sps.sao_enabled and any_sao:
        from hm16_2_tpu.ops.sao_ref import sao_picture
        sao_picture(pic)
