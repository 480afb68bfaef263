"""World simulation: ground truth, steering, sensing, noise."""
