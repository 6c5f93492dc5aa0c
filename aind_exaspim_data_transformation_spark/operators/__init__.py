from .downsample import DOWNSAMPLE_MODES, downsample_block

__all__ = ["downsample_block", "DOWNSAMPLE_MODES"]
