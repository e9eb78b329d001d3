"""Domain layer: the reference's job-offer ("offres") data model."""
