from . import collectives, consensus, mesh, sharding
from .mesh import BATCH, MODEL, batch_mesh, make_mesh, model_mesh
