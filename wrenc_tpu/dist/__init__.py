from .sharded import make_mesh, sharded_search_step
