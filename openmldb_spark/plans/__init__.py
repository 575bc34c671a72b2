"""Plans: DEPLOY (named feature queries) and request-mode evaluation."""

from openmldb_spark.plans.deploy import Deployment, deploy, get_deployment

__all__ = ["Deployment", "deploy", "get_deployment"]
