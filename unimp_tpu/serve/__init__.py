"""Distributed serving: controller (worker registry + dispatch), model
workers (streaming generation), chat CLI, conversation templates."""
