from . import rays, renderer
