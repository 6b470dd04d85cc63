from . import admm, gradient_descent, prox, proximal_gradient, tnls, tnt
