"""Pipeline compositions over ray.data.Dataset."""
