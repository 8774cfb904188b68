"""Entity-resolution pipeline stages (extract → normalize → block →
score → cluster), each a Ray Data batch transform."""
