from .mesh import make_mesh, sp_backend, sp_plane_sharding, dryrun_step
from .decode import MeshDecoder, split_closed_gops
