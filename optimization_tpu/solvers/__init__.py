from . import gradient_descent
