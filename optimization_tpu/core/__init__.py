from . import problem, tree, types
