"""Estimation engines: EKF-SLAM and Rao-Blackwellized particle filter."""
