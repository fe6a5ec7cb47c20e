"""Model zoo registry — the 16 public names of the reference
(models/__init__.py:19-35), rebuilt TPU-native.

Every model: ctor `(args=None, div_flow=0.05, ...)`;
`init(key) -> params` pytree; `apply(params, input_dict, training) ->
output_dict`. input_dict carries NHWC `input1`/`input2` in [0,1].
"""

from .pwc_family import (
    PWCNet,
    PWCNet_bi,
    PWCNet_occ,
    PWCNet_occ_bi,
    PWCNet_irr,
    PWCNet_irr_bi,
    PWCNet_irr_occ,
    PWCNet_irr_occ_bi,
)
from .irr_pwc import IRR_PWC
from .flownet_family import (
    FlowNet1S,
    FlowNet1S_irr,
    FlowNet1S_irr_bi,
    FlowNet1S_irr_occ,
    FlowNet1S_irr_occ_bi,
)
from .irr_flownet import IRR_FlowNet
