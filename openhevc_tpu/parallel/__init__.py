from .mesh import make_mesh, sharded_recon_step, dryrun_step
from .decode import MeshDecoder, split_closed_gops
