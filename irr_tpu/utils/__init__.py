"""Host utilities: flow file I/O and visualization."""

from .flow_io import write_flo, write_flow_png, read_flo
from .flow_viz import flow_to_rgb, flow_to_rgb_middlebury
