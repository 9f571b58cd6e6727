"""Host-side utilities: audio I/O, resampling, weight conversion/checkpoint IO."""
