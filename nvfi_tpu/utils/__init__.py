from . import seg_loss
