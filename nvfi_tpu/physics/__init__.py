from . import pde
