from . import velocity, shaders, kplane, mask_field, tensorf_vm
