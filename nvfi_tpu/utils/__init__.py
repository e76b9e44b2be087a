from . import seg_loss, viz
