"""placeholder — populated later this round."""
