"""Plans: the declarative pipeline spec and its DataFrame compiler.

Analog of the reference's config-compile path (lib/cfg-tree.c:982-1170
LogExprNode → LogPipe graph): a PipelineSpec compiles into chained
DataFrame transformations; Catalyst is the physical planner.
"""
