from . import edges, features, graph, segment
