from . import optim, checkpoint, trainer
